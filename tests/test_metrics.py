"""Evaluation-metric unit tests with analytic oracles."""
import numpy as np
import pytest

from multimodal_3d_image_segmentation_tpu.metrics import (
    compute_regional_metrics, dice_binary, get_labels_union, hd95_binary,
    statistics_regional, surface_dice_binary)


def test_dice_binary():
    a = np.zeros((4, 4, 4), bool)
    b = np.zeros((4, 4, 4), bool)
    a[:2], b[:2] = True, True
    assert dice_binary(a, b) == 1.0
    b[:] = False
    b[:1] = True
    assert dice_binary(a, b) == pytest.approx(2 * 16 / (32 + 16))
    assert np.isnan(dice_binary(np.zeros_like(a), b))  # absent label -> NaN


def test_get_labels_union():
    y = np.array([0, 1, 2, 3, 2])
    np.testing.assert_array_equal(get_labels_union(y, [1, 3]),
                                  [False, True, False, True, False])
    np.testing.assert_array_equal(get_labels_union(y, 2),
                                  [False, False, True, False, True])


def test_surface_dice_perfect_and_shifted():
    a = np.zeros((12, 12, 12), bool)
    a[3:9, 3:9, 3:9] = True
    assert surface_dice_binary(a, a, (1.0, 1.0, 1.0)) == 1.0

    b = np.roll(a, 1, axis=0)  # 1-voxel shift: all surfaces within 1mm
    sd = surface_dice_binary(a, b, (1.0, 1.0, 1.0))
    assert sd == 1.0
    # anisotropic spacing: the 3mm shift along axis 0 exceeds the
    # tolerance (= mean spacing 5/3 mm), so agreement drops
    sd_aniso = surface_dice_binary(a, b, (3.0, 1.0, 1.0))
    assert 0.5 < sd_aniso < 1.0


def test_hd95_shifted_cube():
    a = np.zeros((16, 16, 16), bool)
    a[4:12, 4:12, 4:12] = True
    b = np.roll(a, 2, axis=1)
    hd = hd95_binary(a, b, (1.0, 1.0, 1.0))
    assert 1.0 <= hd <= 3.0  # ~2mm shift
    assert np.isnan(hd95_binary(np.zeros_like(a), b, (1.0, 1.0, 1.0)))


def test_compute_regional_metrics_keys():
    a = np.zeros((8, 8, 8), np.uint8)
    a[2:6, 2:6, 2:6] = 1
    out = compute_regional_metrics(a, a, (1, 1, 1), labels=[1])
    assert out["dice"] == 1.0 and out["surface_dice"] == 1.0
    # hd95 applies the reference's binary_opening denoising to the
    # prediction (experiments/metrics.py:158-163), which erodes cube
    # corners, so even identical masks give a small nonzero HD95
    assert out["hd95"] <= 2.0
    out2 = compute_regional_metrics(a, a, labels=[1], use_surface_dice=False,
                                    use_hd95=False)
    assert set(out2) == {"dice"}


def test_statistics_regional_outputs(tmp_path):
    from multimodal_3d_image_segmentation_tpu.data.nifti import write_image
    rng = np.random.default_rng(0)
    y_true, y_pred, files = [], [], []
    for i in range(3):
        t = rng.integers(0, 3, (6, 6, 6)).astype(np.uint8)
        p = t.copy()
        p[0, 0, 0] = (p[0, 0, 0] + 1) % 3
        fn = str(tmp_path / f"case{i}" / "seg.nii.gz")
        write_image(t, fn)
        y_true.append(t)
        y_pred.append(p)
        files.append(fn)

    out = statistics_regional(y_true, y_pred, files, str(tmp_path),
                              region_names=["bg", "fg"],
                              region_labels=[[0], [1, 2]], is_print=False)
    assert (tmp_path / "results_regional.csv").exists()
    assert (tmp_path / "average_results_regional.txt").exists()
    assert out["dice"].shape == (3, 2)
    assert np.all(out["dice"] > 0.9)

    # parallel path produces the same values
    out2 = statistics_regional(y_true, y_pred, files, str(tmp_path),
                               region_names=["bg", "fg"],
                               region_labels=[[0], [1, 2]], is_print=False,
                               nproc=2)
    np.testing.assert_allclose(out2["dice"], out["dice"])
