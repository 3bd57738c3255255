"""Config loading / binding / normalization tests
(reference model: ``tests/config/test_config.py``)."""

import pytest
import yaml

from ons_utils_spark.config import Config, ConfigFormatError, LoggingConfig


@pytest.fixture()
def config_dir(tmp_path):
    d = tmp_path / "config"
    d.mkdir()
    (d / "pipeline.yaml").write_text(
        yaml.safe_dump(
            {
                "settings": {"threads": 4, "verbose": True},
                "mappers": {"a": "m/a.parquet", "b": "m/b.parquet"},
                "groups": {"g1": ["x", "y"], "g2": "z"},
                "stages": ["load", "clean"],
            }
        )
    )
    (d / "scalar.yaml").write_text("just a string\n")
    sub = d / "sub"
    sub.mkdir()
    (sub / "nested.yaml").write_text(yaml.safe_dump({"k": 1}))
    return d


class TestConfigLoading:
    def test_binds_attributes(self, config_dir):
        cfg = Config("pipeline", config_dir=config_dir)
        assert cfg.settings == {"threads": 4, "verbose": True}
        assert cfg.stages == ["load", "clean"]

    def test_to_unpack_hoists_nested_mapping(self, config_dir):
        cfg = Config("pipeline", to_unpack=["settings"], config_dir=config_dir)
        assert cfg.threads == 4
        assert cfg.verbose is True
        assert cfg.settings == {"threads": 4, "verbose": True}

    def test_to_unpack_non_mapping_raises(self, config_dir):
        with pytest.raises(TypeError, match="must be a mapping"):
            Config("pipeline", to_unpack=["stages"], config_dir=config_dir)

    def test_non_mapping_yaml_raises(self, config_dir):
        with pytest.raises(ConfigFormatError):
            Config("scalar", config_dir=config_dir)

    def test_subdir(self, config_dir):
        cfg = Config("nested", subdir="sub", config_dir=config_dir)
        assert cfg.k == 1

    def test_env_var_cascade(self, config_dir, monkeypatch):
        monkeypatch.setenv("MYAPP_CONFIG", str(config_dir))
        cfg = Config("pipeline", app_name="myapp")
        assert cfg.settings == {"threads": 4, "verbose": True}

    def test_missing_config_dir_raises(self, monkeypatch, tmp_path):
        monkeypatch.delenv("NOSUCHAPP_CONFIG", raising=False)
        monkeypatch.setattr("pathlib.Path.home", lambda: tmp_path / "nohome")
        monkeypatch.chdir(tmp_path)
        with pytest.raises(FileNotFoundError, match="no config directory"):
            Config("pipeline", app_name="nosuchapp")


class TestNormalizationPasses:
    def test_get_key_value_pairs(self, config_dir):
        cfg = Config("pipeline", config_dir=config_dir)
        cfg.get_key_value_pairs(["groups"])
        assert cfg.groups == [("g1", "x"), ("g1", "y"), ("g2", "z")]

    def test_extend_and_remove(self, config_dir):
        cfg = Config("pipeline", config_dir=config_dir)
        cfg.extend_attr("stages", "write")
        assert cfg.stages == ["load", "clean", "write"]
        cfg.remove_from_attr("stages", ["clean"])
        assert cfg.stages == ["load", "write"]

    def test_extend_non_sequence_raises(self, config_dir):
        cfg = Config("pipeline", config_dir=config_dir)
        with pytest.raises(AttributeError, match="not an extendable type"):
            cfg.extend_attr("settings", "x")

    def test_prepend_dir_on_mapping(self, config_dir):
        cfg = Config("pipeline", config_dir=config_dir)
        cfg.prepend_dir(["mappers"], "/data")
        assert cfg.mappers["a"] == "/data/m/a.parquet"

    def test_flatten_nested_dicts(self, config_dir):
        cfg = Config("pipeline", config_dir=config_dir)
        cfg.flatten_nested_dicts(["settings"])
        assert cfg.settings == {("threads",): 4, ("verbose",): True}


class TestLoggingConfig:
    def test_log_id_format_and_paths(self, tmp_path):
        lc = LoggingConfig(app_name="testapp", log_dir=tmp_path / "logs")
        assert lc.log_id.startswith("log_")
        assert lc.full_path.endswith(".log")

    def test_set_logging_config_writes_file(self, tmp_path):
        import logging

        root = logging.getLogger()
        saved_handlers = root.handlers[:]
        try:
            lc = LoggingConfig(app_name="testapp", log_dir=tmp_path)
            lc.create_logs_dir()
            lc.set_logging_config()
            root.info("hello from test")
            assert (tmp_path / lc.filename).exists()
        finally:
            # Detach the temp-file handler so later teardown logging doesn't
            # write to a deleted tmp_path.
            for h in root.handlers[:]:
                h.close()
                root.removeHandler(h)
            root.handlers.extend(saved_handlers)
            root.propagate = True
