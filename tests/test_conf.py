"""Config cascade (O23) — mirrors the reference's client/test/test_config.py
cases plus explicit precedence checks: file < environment < args."""

import os

import pytest

from datalake_spark import conf
from datalake_spark.conf import InsufficientConfiguration, load_config


@pytest.fixture()
def clean_env(monkeypatch):
    for k in list(os.environ):
        if k.startswith("DATALAKE_") or k == "TESTVAR_CASCADE":
            monkeypatch.delenv(k, raising=False)
    return monkeypatch


def _conf_file(tmp_path, content):
    f = tmp_path / "datalake.env"
    f.write_text(content)
    return str(f)


def test_config_file_loads(clean_env, tmp_path):
    f = _conf_file(tmp_path, "TESTVAR_CASCADE=FOO\n")
    load_config(config_file=f)
    assert os.environ["TESTVAR_CASCADE"] == "FOO"


def test_config_file_from_envvar(clean_env, tmp_path):
    f = _conf_file(tmp_path, "TESTVAR_CASCADE=BAR\n")
    clean_env.setenv("DATALAKE_CONFIG", f)
    load_config()
    assert os.environ["TESTVAR_CASCADE"] == "BAR"


def test_no_such_config(clean_env):
    with pytest.raises(InsufficientConfiguration):
        load_config(config_file="/no/such/config")


def test_no_such_config_envvar(clean_env):
    clean_env.setenv("DATALAKE_CONFIG", "/no/such/config")
    with pytest.raises(InsufficientConfiguration):
        load_config()


def test_missing_default_config_is_silent(clean_env, monkeypatch):
    monkeypatch.setattr(conf, "DEFAULT_CONFIG", "/no/such/default")
    load_config()  # must not raise


def test_env_beats_file(clean_env, tmp_path):
    clean_env.setenv("TESTVAR_CASCADE", "FROM_ENV")
    f = _conf_file(tmp_path, "TESTVAR_CASCADE=FROM_FILE\n")
    load_config(config_file=f)
    assert os.environ["TESTVAR_CASCADE"] == "FROM_ENV"


def test_kwargs_beat_env_and_file(clean_env, tmp_path):
    clean_env.setenv("DATALAKE_STORAGE_URL", "file:///from-env")
    f = _conf_file(tmp_path, "DATALAKE_STORAGE_URL=file:///from-file\n")
    load_config(config_file=f, storage_url="file:///from-args")
    assert os.environ["DATALAKE_STORAGE_URL"] == "file:///from-args"


def test_kwarg_name_mapping(clean_env):
    load_config(config_file=None, storage_url="x", aws_region="eu-west-1")
    assert os.environ["DATALAKE_STORAGE_URL"] == "x"
    assert os.environ["AWS_REGION"] == "eu-west-1"  # aws_* keeps its prefix


def test_none_kwargs_skipped(clean_env):
    load_config(config_file=None, storage_url=None)
    assert "DATALAKE_STORAGE_URL" not in os.environ


def test_dotenv_parsing(clean_env, tmp_path):
    f = _conf_file(
        tmp_path,
        "# comment\n\nexport TESTVAR_CASCADE='quoted value'\nBADLINE\n",
    )
    load_config(config_file=f)
    assert os.environ["TESTVAR_CASCADE"] == "quoted value"


def test_cli_uses_file_layer(clean_env, tmp_path, monkeypatch):
    """End-to-end: storage url supplied only via config file reaches fetch."""
    import io

    from datalake_spark.archive import Archive
    from datalake_spark.cli import run

    store = Archive(f"file://{tmp_path}/store")
    url = store.store(
        {"id": "c1", "what": "syslog", "where": "w", "start": 0, "end": None,
         "path": "/x", "hash": "0" * 32, "work_id": None},
        b"via config file",
    )
    f = _conf_file(tmp_path, f"DATALAKE_STORAGE_URL={store.storage_url}\n")
    monkeypatch.chdir(tmp_path)
    out = io.StringIO()
    assert run(["--config", f, "cat", url], out=out) == 0
    assert out.getvalue() == "via config file"
