import textwrap

from modest_tpu.utils.config import (
    Config,
    cfg_from_kv_overrides,
    cfg_from_list,
    cfg_from_yaml_file,
)


def test_attr_access_and_nesting():
    c = Config({"a": {"b": 1}, "l": [{"x": 2}]})
    assert c.a.b == 1
    assert c.l[0].x == 2
    c.a.new = {"deep": True}
    assert c.a.new.deep is True


def test_base_config_merge(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(textwrap.dedent("""
        DATA: {PATH: /x, SPLIT: train}
        OPT: {LR: 0.01}
    """))
    child = tmp_path / "child.yaml"
    child.write_text(textwrap.dedent(f"""
        _BASE_CONFIG_: {base}
        DATA: {{SPLIT: val}}
        MODEL: {{NAME: PointRCNN}}
    """))
    cfg = cfg_from_yaml_file(child)
    assert cfg.DATA.PATH == "/x"
    assert cfg.DATA.SPLIT == "val"
    assert cfg.OPT.LR == 0.01
    assert cfg.MODEL.NAME == "PointRCNN"


def test_dotted_overrides():
    cfg = Config({"A": {"B": {"C": 1}}, "F": [1, 2]})
    cfg_from_list(["A.B.C", "5", "F", "[3, 4]"], cfg)
    assert cfg.A.B.C == 5
    assert list(cfg.F) == [3, 4]


def test_kv_overrides():
    cfg = Config({"nms": {"threshold": 0.1}, "fov_only": True})
    cfg_from_kv_overrides(["nms.threshold=0.3", "fov_only=false"], cfg)
    assert cfg.nms.threshold == 0.3
    assert cfg.fov_only is False
