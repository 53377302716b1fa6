"""Config cascade (O23): config file < environment < explicit args.

Tracks the reference's semantics (client/datalake/config_helpers.py:9-38 and
client/datalake/common/conf.py:20-81) without the python-dotenv dependency:
configuration reaches the application exclusively through the environment.
The file layer only fills variables the environment doesn't already set;
explicit kwargs (CLI args) overwrite unconditionally.
"""

from __future__ import annotations

import os

DEFAULT_CONFIG = "/etc/datalake.env"


class InsufficientConfiguration(Exception):
    """A required configuration source is missing or unreadable."""


def load_config(config_file: str | None = None, **kwargs) -> None:
    """Apply the cascade.  ``config_file`` resolution when None: the
    DATALAKE_CONFIG environment variable, else DEFAULT_CONFIG (which is
    skipped silently if absent — an explicitly named file that does not
    exist raises InsufficientConfiguration)."""
    _read_config_file(config_file)
    _update_environment(**kwargs)


def _read_config_file(config_file: str | None) -> None:
    if config_file is None:
        config_file = os.environ.get("DATALAKE_CONFIG", DEFAULT_CONFIG)
    if os.path.exists(config_file):
        for key, value in _parse_env_file(config_file):
            os.environ.setdefault(key, value)  # env beats file
    elif config_file != DEFAULT_CONFIG:
        raise InsufficientConfiguration(f"Config file {config_file} not exist.")


def _parse_env_file(path: str) -> list[tuple[str, str]]:
    """Minimal dotenv: KEY=VALUE lines, ``#`` comments and blanks ignored,
    surrounding single/double quotes stripped, optional ``export`` prefix."""
    out = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            if line.startswith("export "):
                line = line[len("export "):]
            key, _, value = line.partition("=")
            key, value = key.strip(), value.strip()
            if len(value) >= 2 and value[0] == value[-1] and value[0] in "'\"":
                value = value[1:-1]
            if key:
                out.append((key, value))
    return out


def _update_environment(**kwargs) -> None:
    """kwargs are lowercase; ``foo`` maps to DATALAKE_FOO, except ``aws_*``
    which map to their own upper-cased name (conf.py:39-43,74-81)."""
    for k, v in kwargs.items():
        if v is None:
            continue
        if not k.startswith("aws_"):
            k = "DATALAKE_" + k
        os.environ[k.upper()] = str(v)
