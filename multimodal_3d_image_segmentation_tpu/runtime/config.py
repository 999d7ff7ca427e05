"""Config system: INI files with Python-literal values.

Same dialect as the reference (``experiments/utils.py:137-184``):
``ConfigParser`` with ``ExtendedInterpolation``, every value parsed by
``ast.literal_eval`` (so configs contain lists/dicts/tuples/numbers), and
the raw config text snapshotted into each run's output dir. Existing
reference config files parse unchanged.
"""
from __future__ import annotations

import ast
import os
from collections import OrderedDict
from configparser import ConfigParser, ExtendedInterpolation
from io import StringIO

__all__ = ["get_config", "save_config"]


def get_config(config_file, source=None):
    """Parse a config file (path or StringIO) into {section: {key: val}}.

    Inline ``#`` comments are stripped at parse time. (The reference relies
    on ``ast.literal_eval`` ignoring trailing comments, which corrupts
    values that are *interpolated* into other values — e.g. a commented
    ``list_dir`` used via ``${list_dir}`` swallows the rest of the line.
    Stripping at parse time keeps both cases correct.)
    """
    config = ConfigParser(interpolation=ExtendedInterpolation(),
                          inline_comment_prefixes=("#",))
    if isinstance(config_file, StringIO):
        config.read_file(config_file, source)
    else:
        config.read(config_file)
        source = config_file

    output = OrderedDict()
    for section in config.sections():
        output[section] = OrderedDict()
        for k, v in config.items(section):
            try:
                output[section][k] = ast.literal_eval(v)
            except ValueError as e:
                raise ValueError(str(e) + "\n%s: %s" % (k, v))

    output["config_file"] = (os.path.basename(source)
                             if source is not None else None)
    output["config"] = StringIO()
    config.write(output["config"])
    return output


def save_config(config_args, output_dir):
    """Snapshot the raw config text into the output dir."""
    with open(os.path.join(output_dir, config_args["config_file"]), "w") as f:
        f.write(config_args["config"].getvalue())
