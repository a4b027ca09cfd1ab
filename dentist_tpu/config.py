"""Configuration file system.

Mirrors the reference's config semantics
(``source/dentist/common/configfile.d``):

- YAML or JSON file with a ``__default__`` section applied to every
  command plus per-command sections keyed by CLI command name
  (``configDefaultKey``, ``configfile.d:72-82``);
- comment keys starting with ``//`` are ignored;
- CLI arguments win over config values (config is merged "retroactively"
  into defaults — ``retroInitFromConfig``, ``configfile.d:117``);
- file size capped at 256 MiB (``configfile.d``);
- dashed keys (``max-coverage-self``) map to python option names
  (``max_coverage_self``).
"""

from __future__ import annotations

import json
import os

__all__ = ["load_config", "command_options", "ConfigError", "CONFIG_DEFAULT_KEY"]

CONFIG_DEFAULT_KEY = "__default__"
MAX_CONFIG_SIZE = 256 * 1024 * 1024


class ConfigError(Exception):
    pass


def load_config(path: str) -> dict:
    if os.path.getsize(path) > MAX_CONFIG_SIZE:
        raise ConfigError(f"config file exceeds {MAX_CONFIG_SIZE} bytes")
    with open(path) as fh:
        text = fh.read()
    try:
        data = json.loads(text)
    except json.JSONDecodeError:
        import yaml

        try:
            data = yaml.safe_load(text)
        except yaml.YAMLError as exc:
            raise ConfigError(f"config is neither valid JSON nor YAML: {exc}")
    if not isinstance(data, dict):
        raise ConfigError("config root must be a mapping")
    return _strip_comments(data)


def _strip_comments(obj):
    if isinstance(obj, dict):
        return {k: _strip_comments(v) for k, v in obj.items() if not str(k).startswith("//")}
    if isinstance(obj, list):
        return [_strip_comments(v) for v in obj]
    return obj


def command_options(config: dict, command: str) -> dict:
    """Merged option dict for `command`: defaults then command section."""
    merged: dict = {}
    for section in (config.get(CONFIG_DEFAULT_KEY, {}), config.get(command, {})):
        if not isinstance(section, dict):
            raise ConfigError(f"config section for {command!r} must be a mapping")
        for k, v in section.items():
            merged[str(k).replace("-", "_")] = v
    return merged


def apply_config(args, config: dict, command: str, explicit: set[str]) -> None:
    """Set config values on an argparse namespace unless given on the CLI.

    `explicit` holds destination names the user set explicitly; config
    never overrides those (CLI wins — reference ``retroInitFromConfig``).
    """
    for key, value in command_options(config, command).items():
        if key in explicit or not hasattr(args, key):
            continue
        setattr(args, key, value)


def validate_config(config: dict, known_commands: list[str]) -> list[str]:
    """Semantic checks; returns a list of error strings (empty = valid)."""
    errors = []
    for key in config:
        if key != CONFIG_DEFAULT_KEY and key not in known_commands:
            errors.append(f"unknown config section: {key!r}")
    default = config.get(CONFIG_DEFAULT_KEY, {})
    if not isinstance(default, dict):
        errors.append("__default__ must be a mapping")
    # mutually exclusive options (validate_dentist_config.py semantics)
    for section_name, section in config.items():
        if not isinstance(section, dict):
            continue
        if "read_coverage" in _norm(section) and "max_coverage_reads" in _norm(section):
            errors.append(
                f"{section_name}: must not provide both read-coverage and max-coverage-reads"
            )
    return errors


def _norm(section: dict) -> set[str]:
    return {str(k).replace("-", "_") for k in section}
