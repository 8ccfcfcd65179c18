"""Config parser tests: HOCON-subset semantics + the shipped conf files."""

import os

from avr_tpu.config import parse_conf, parse_conf_string

CONF_DIR = os.path.join(os.path.dirname(__file__), "..", "conf")


def test_scalars_and_nesting():
    conf = parse_conf_string(
        """
        # comment
        a = 1
        b = 2.5       // trailing comment
        c = True
        d = hello
        e = "quoted string"
        sub {
            x = false
            deeper { y = 7 }
        }
        """
    )
    assert conf.get_int("a") == 1
    assert conf.get_float("b") == 2.5
    assert conf.get_bool("c") is True
    assert conf.get_string("d") == "hello"
    assert conf.get_string("e") == "quoted string"
    assert conf["sub"].get_bool("x") is False
    assert conf["sub"]["deeper"].get_int("y") == 7
    assert conf.get_int("sub.deeper.y") == 7


def test_defaults():
    conf = parse_conf_string("a = 1")
    assert conf.get_int("missing", 42) == 42
    assert conf.get_bool("missing", True) is True
    assert conf.get("missing") is None


def test_include_merge(tmp_path):
    (tmp_path / "base.conf").write_text("m { a = 1\n b = 2 }\n")
    (tmp_path / "child.conf").write_text('include required("base.conf")\nm { b = 3 }\n')
    conf = parse_conf(str(tmp_path / "child.conf"))
    assert conf["m"].get_int("a") == 1
    assert conf["m"].get_int("b") == 3  # child overrides


def test_shipped_default_conf():
    conf = parse_conf(os.path.join(CONF_DIR, "default.conf"))
    m = conf["model"]
    assert m.get_bool("use_encoder") is True
    assert m.get_bool("use_xyz") is True
    assert m.get_bool("use_viewdirs") is True
    assert m.get_bool("use_code_viewdirs") is False
    assert m["code"].get_int("num_freqs") == 6
    assert m["code"].get_float("freq_factor") == 1.5
    nr = conf["normal_renderer"]
    assert nr.get_float("near") == 0.8 and nr.get_float("far") == 1.8
    assert nr.get_int("n_coarse") == 64 and nr.get_int("n_fine") == 32
    assert nr.get_int("n_fine_depth") == 16
    ar = conf["adaptive_renderer"]
    assert ar.get_float("epsilon") == 0.15 and ar.get_int("n_coarse") == 20


def test_shipped_mv_conf_overrides_mlp():
    conf = parse_conf(os.path.join(CONF_DIR, "default_mv.conf"))
    mc = conf["model"]["mlp_coarse"]
    assert mc.get_int("n_blocks") == 5
    assert mc.get_int("combine_layer") == 3
    assert mc.get_string("combine_type") == "average"
    # inherited values survive the merge
    assert conf["model"].get_bool("use_encoder") is True
    assert conf["normal_renderer"].get_int("n_coarse") == 64
