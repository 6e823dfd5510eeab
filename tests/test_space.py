"""ParameterSpace codec, conditionals, fixed params, determinism."""

import numpy as np
import pytest

from scamlgp_tpu.bo.space import (
    CategoricalParameter,
    ContinuousParameter,
    IntegerParameter,
    OrdinalParameter,
    ParameterSpace,
    impute_nans_with_constant,
)


def _mixed_space():
    s = ParameterSpace()
    s.add(ContinuousParameter("x", (-5.0, 10.0)))
    s.add(ContinuousParameter("lr", (1e-5, 1e-1), transformation="log"))
    s.add(IntegerParameter("n", (1, 16)))
    s.add(CategoricalParameter("opt", ["adam", "sgd", "lbfgs"]))
    s.add(OrdinalParameter("size", ["s", "m", "l"]))
    return s


def test_roundtrip_mixed(rng):
    s = _mixed_space()
    for _ in range(50):
        c = s.sample(rng)
        vec = s.to_numerical(c)
        assert vec.shape == (5,)
        assert np.all((vec >= 0) & (vec <= 1))
        c2 = s.from_numerical(vec)
        assert c2["n"] == c["n"]
        assert c2["opt"] == c["opt"]
        assert c2["size"] == c["size"]
        assert abs(c2["x"] - c["x"]) < 1e-9
        assert abs(np.log(c2["lr"]) - np.log(c["lr"])) < 1e-9


def test_log_transformation_uniform_in_log_space():
    p = ContinuousParameter("lr", (1e-4, 1.0), transformation="log")
    assert abs(p.from_unit(0.5) - 1e-2) < 1e-9
    assert abs(p.to_unit(1e-2) - 0.5) < 1e-9


def test_integer_codec_covers_all_values():
    p = IntegerParameter("n", (3, 7))
    seen = {p.from_unit(u) for u in np.linspace(0, 1, 101)}
    assert seen == {3, 4, 5, 6, 7}
    for v in range(3, 8):
        assert p.from_unit(p.to_unit(v)) == v


def test_seeded_sampling_deterministic():
    s1, s2 = _mixed_space(), _mixed_space()
    s1.seed(42)
    s2.seed(42)
    for _ in range(10):
        assert s1.sample() == s2.sample()


def test_fixed_parameters_excluded_from_encoding():
    s = _mixed_space()
    assert len(s) == 5
    s.fix(opt="sgd")
    assert len(s) == 4
    c = s.sample(np.random.default_rng(0))
    assert c["opt"] == "sgd"
    vec = s.to_numerical(c)
    assert vec.shape == (4,)
    c2 = s.from_numerical(vec)
    assert c2["opt"] == "sgd"
    with pytest.raises(ValueError):
        s.fix(opt="nope")


def test_conditional_space_nan_encoding(rng):
    s = ParameterSpace()
    s.add(CategoricalParameter("method", ["a", "b"]))
    s.add(ContinuousParameter("xa", (0.0, 1.0)),
          condition=lambda method: method == "a")
    s.add(ContinuousParameter("xb", (0.0, 1.0)),
          condition=lambda method: method == "b")
    for _ in range(20):
        c = s.sample(rng)
        vec = s.to_numerical(c)
        if c["method"] == "a":
            assert "xa" in c and "xb" not in c
            assert np.isfinite(vec[1]) and np.isnan(vec[2])
        else:
            assert np.isfinite(vec[2]) and np.isnan(vec[1])
        c2 = s.from_numerical(vec)
        assert c2 == c
    imp = impute_nans_with_constant(s.to_numerical(c))
    assert np.all(np.isfinite(imp))


def test_continuous_bounds():
    s = ParameterSpace()
    s.add(ContinuousParameter("a", (-5, 10)))
    s.add(ContinuousParameter("b", (0, 15)))
    assert s.get_continuous_bounds() == [(-5.0, 10.0), (0.0, 15.0)]


def test_duplicate_parameter_rejected():
    s = ParameterSpace()
    s.add(ContinuousParameter("a", (0, 1)))
    with pytest.raises(ValueError, match="Duplicate"):
        s.add(ContinuousParameter("a", (0, 2)))
