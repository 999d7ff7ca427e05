"""V-Net-DS flat-path stage decomposition at the flagship shape (VERDICT
r4 #4: measure the 31.9 -> <=30 ms gap, don't reason about it).

Times each distinct stage of ``VNetDS._flat_forward`` STANDALONE at its
exact flagship shape (240x240x155, filters 24, num_blocks [1,2,3,3,3],
DS legs [0..4]) and compares the sum against the whole model:

  * every unique conv3_flat signature x its call count (the 29-call
    inventory traced from the forward; residual taps and prologues
    included so the kernels compile in their real forms)
  * the stride-2 decimation / transpose-conv interleave / crop / DS
    nearest-upsample 0/1 lane-selection einsums
  * GroupNorm epilogues that materialize as standalone elementwise
    passes (the residual-tap epilogue; chain GNs ride kernel prologues)
  * the Pallas entry conv and the channel-first tail
    (final 1x1 -> from_flat -> matmul-trilinear resize -> padcrop ->
    softmax)

The deltas between (sum of parts) and (whole model) bound what better
inter-stage scheduling could save; the per-row table shows which stages
are worth a restructure A/B. Chained-loop timing; run ON THE TPU.
"""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_3d_image_segmentation_tpu import models
from multimodal_3d_image_segmentation_tpu.kernels.conv3d_flat import (
    conv3_flat)
from multimodal_3d_image_segmentation_tpu.kernels.conv_in import conv_in_s2d
from multimodal_3d_image_segmentation_tpu.models.architectures import (
    _flat_crop, _flat_gn_act, _flat_nearest_upsample, _lane_select)
from multimodal_3d_image_segmentation_tpu.ops.flatvol import (flat_geom,
                                                              from_flat)
from multimodal_3d_image_segmentation_tpu.ops.resize import resize_linear
from multimodal_3d_image_segmentation_tpu.ops.padcrop import spatial_padcrop
from multimodal_3d_image_segmentation_tpu.ops.spectral import (
    packed_high_dcn_mix)
from multimodal_3d_image_segmentation_tpu.utils.profiling import (
    enable_compilation_cache, timed_loop_ms)

rng = np.random.default_rng(0)
ROWS = []


def arr(shape, scale=1.0):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                       * scale)


def t(name, fn, x, count=1, n_long=8):
    ms = timed_loop_ms(fn, x, n_short=2, n_long=n_long, repeats=3)
    ROWS.append((name, ms, count))
    print(f"  {name:44s} {ms:7.3f} ms x{count} = {ms * count:7.3f}",
          flush=True)
    return ms


# level geometries (conv_in halving of 240x240x155, then flat halvings)
G = [flat_geom(121, 121, 78), flat_geom(61, 61, 39), flat_geom(31, 31, 20),
     flat_geom(16, 16, 10), flat_geom(8, 8, 5)]


def time_conv(name, ci, co, g, count, pro=False, res=0, stats=True,
              nparts=1):
    k = arr((3, 3, 3, ci, co), 0.1)
    b = arr((co,), 0.1)
    kw = dict(emit_stats=stats)
    if pro:
        kw.update(prologue=(arr((ci,), 0.1) + 1.0, arr((ci,), 0.1)),
                  prologue_act="elu")
    if res:
        kw.update(residual=(arr((res, ci), 0.1), arr((res,), 0.1)))
    if nparts > 1:
        x2 = arr((g.d + 2, ci - ci // 2, g.npl))

        def fn(xv):
            return conv3_flat((xv, x2), k, b, g, **kw)
        x = arr((g.d + 2, ci // 2, g.npl))
    else:
        def fn(xv):
            return conv3_flat(xv, k, b, g, **kw)
        x = arr((g.d + 2, ci, g.npl))
    return t(name, fn, x, count)


def main():
    enable_compilation_cache()
    # match the SHIPPED serving precision (zoo fp32 rows run 'high');
    # the default HIGHEST costs ~6 ms extra whole-model (measured: 37.7
    # vs 31.9 ms) in the XLA einsum stages (DS legs, resize, selects)
    from multimodal_3d_image_segmentation_tpu.ops import spectral
    spectral.set_fp32_transform_precision("high")
    print("== whole model (flat path) ==", flush=True)
    model = models.VNetDS(4, 4, 24, [1, 2, 3, 3, 3],
                          right_leg_indexes=[0, 1, 2, 3, 4],
                          use_pallas=True)
    x_full = arr((1, 4, 240, 240, 155))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros_like(x_full))["params"]
    total = timed_loop_ms(lambda v: model.apply({"params": params}, v),
                          x_full, n_short=1, n_long=5, repeats=3)
    print(f"VNetDS flat total: {total:.2f} ms ({330/total:.2f}x V100)",
          flush=True)

    print("== entry ==", flush=True)
    k_in, b_in = arr((2, 2, 2, 4, 24), 0.1), arr((24,), 0.1)
    t("conv_in_s2d 4->24 @240^2x155", lambda v: conv_in_s2d(
        v, k_in, b_in, apply_selu=False), x_full)

    print("== k3 convs (count = calls in one forward) ==", flush=True)
    # encode
    time_conv("enc L0 24->24 res+stats", 24, 24, G[0], 1, res=24)
    time_conv("L0 24->24 plain (down @full-res)", 24, 24, G[0], 1,
              stats=False)
    time_conv("enc L1 24->48 res", 24, 48, G[1], 1, res=48)
    time_conv("L1 48->48 pro", 48, 48, G[1], 2, pro=True)
    time_conv("L1 48->48 plain (down)", 48, 48, G[1], 1, stats=False)
    time_conv("enc L2 48->96 res", 48, 96, G[2], 1, res=96)
    time_conv("L2 96->96 pro", 96, 96, G[2], 4, pro=True)
    time_conv("L2 96->96 plain (down)", 96, 96, G[2], 1, stats=False)
    time_conv("enc L3 96->192 res", 96, 192, G[3], 1, res=192)
    time_conv("L3 192->192 pro", 192, 192, G[3], 4, pro=True)
    time_conv("L3 192->192 plain (down)", 192, 192, G[3], 1, stats=False)
    time_conv("enc L4 192->384 res", 192, 384, G[4], 1, res=384)
    time_conv("L4 384->384 pro", 384, 384, G[4], 2, pro=True)
    # transpose convs (doubled co on the source-plane grid)
    time_conv("up L4->L3 384->2x192 @mid", 384, 384, flat_geom(8, 16, 10),
              1)
    time_conv("up L3->L2 192->2x96... (as 192->192)", 192, 192,
              flat_geom(16, 32, 20), 1)
    time_conv("up L2->L1 (96->96 @mid)", 96, 96, flat_geom(31, 62, 40), 1)
    time_conv("up L1->L0 (48->48 @mid)", 48, 48, flat_geom(61, 122, 78), 1)
    # decode concat convs (virtual concat: 2 parts)
    time_conv("dec L3 384->192 cat res", 384, 192, G[3], 1, res=192,
              nparts=2)
    time_conv("dec L2 192->96 cat res", 192, 96, G[2], 1, res=96,
              nparts=2)
    time_conv("dec L1 96->48 cat res", 96, 48, G[1], 1, res=48,
              nparts=2)
    time_conv("dec L0 48->24 cat res", 48, 24, G[0], 1, res=24,
              nparts=2)

    print("== selection einsums ==", flush=True)
    for i in range(4):
        gh = G[i + 1]
        # decimate2 applies to the plane-sliced tensor (gh.d planes)
        xs = arr((gh.d + 2, [24, 48, 96, 192][i], G[i].npl))
        t(f"decimate2 L{i}->L{i+1} ({[24,48,96,192][i]}ch)",
          lambda v, gi=G[i], gh_=gh: _lane_select(v, gi, gh_, "decimate2"),
          xs)
    for i in range(4):
        g_src, co = G[i + 1], [24, 48, 96, 192][i]
        g2 = flat_geom(2 * g_src.d, 2 * g_src.h, 2 * g_src.w)
        xs = arr((g_src.d + 2, co, g_src.npl))
        t(f"interleave2 L{i+1}->L{i} ({co}ch)",
          lambda v, gs=g_src, g2_=g2: _lane_select(v, gs, g2_,
                                                   "interleave2"), xs)
        if (g2.d, g2.h, g2.w) != (G[i].d, G[i].h, G[i].w):
            xc = arr((g2.d + 2, co, g2.npl))
            t(f"crop L{i} ({co}ch)",
              lambda v, g2_=g2, gi=G[i]: _flat_crop(v, g2_, gi), xc)

    print("== GN epilogues (residual taps, materialized) ==", flush=True)
    xg = arr((G[0].d + 2, 4, G[0].npl))
    t("residual GN+elu @L0 (4ch)",
      lambda v: _flat_gn_act(v, G[0], arr((4,)), arr((4,)), "elu"), xg)

    print("== DS head + tail ==", flush=True)
    for i, ch in enumerate([24, 48, 96, 192, 384]):
        xl = arr((G[i].d + 2, ch, G[i].npl))
        mat = arr((ch, 4), 0.1)

        def leg(v, m=mat, gi=G[i]):
            p = packed_high_dcn_mix(v, m)
            if gi is not G[0]:
                p = _flat_nearest_upsample(p, gi, G[0])
            return p
        t(f"DS leg L{i} mix {ch}->4 + upsample", leg, xl)

    xt = arr((G[0].d + 2, 4, G[0].npl))
    mat4 = arr((4, 4), 0.1)

    def tail(v):
        y = packed_high_dcn_mix(v, mat4)
        y = from_flat(y, G[0])[None]
        y = resize_linear(y, (240, 240, 155), channel_first=True)
        y = spatial_padcrop(y, (240, 240, 155), channel_first=True)
        return jax.nn.softmax(y, axis=1)
    t("tail: 1x1 + from_flat + resize + softmax", tail, xt)

    print("== summary ==", flush=True)
    s = sum(ms * cnt for _, ms, cnt in ROWS)
    print(f"sum of parts: {s:.2f} ms vs whole model {total:.2f} ms "
          f"(gap {total - s:+.2f})", flush=True)
    top = sorted(ROWS, key=lambda r: -r[1] * r[2])[:8]
    for name, ms, cnt in top:
        print(f"  top: {name:44s} {ms * cnt:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
