"""INI-defaults + CLI argument parsing (replaces `prefigure.get_all_args`,
reference train.py:30 / defaults.ini:1-53). Types are inferred from the ini
values; every key becomes a `--key` flag with the ini value as default."""

from __future__ import annotations

import argparse
import ast
import configparser
import typing as tp


def _parse_value(raw: str):
    raw = raw.strip()
    try:
        return ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        return raw


def get_all_args(defaults_file: str = "defaults.ini", argv: tp.Optional[list] = None) -> argparse.Namespace:
    cp = configparser.ConfigParser()
    cp.read(defaults_file)
    defaults = {}
    if cp.has_section("DEFAULTS"):
        for key, raw in cp.items("DEFAULTS"):
            defaults[key] = _parse_value(raw.split("#")[0])

    parser = argparse.ArgumentParser()
    for key, value in defaults.items():
        flag = "--" + key.replace("_", "-")
        if isinstance(value, bool):
            parser.add_argument(flag, dest=key, type=lambda s: s.lower() in ("1", "true", "yes"),
                                default=value)
        elif isinstance(value, (int, float)):
            parser.add_argument(flag, dest=key, type=type(value), default=value)
        else:
            parser.add_argument(flag, dest=key, type=str, default=value)
    return parser.parse_args(argv)
