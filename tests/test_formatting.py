"""Formatting/repr machinery (component #17): behavior contract of
reference formatting.py exercised against our original implementation."""

import numpy as np

from gpyreg_tpu.formatting import (
    format_dict,
    full_repr,
    get_repr,
    summarize,
)


def test_summarize_small_array_prints_contents():
    s = summarize(np.array([1.0, 2.0, 3.0]))
    assert "1." in s and "3." in s and "ndarray" in s


def test_summarize_large_array_prints_shape():
    s = summarize(np.zeros((50, 3)))
    assert "(50, 3)" in s and "ndarray" in s
    # Threshold is configurable.
    assert "0." in summarize(np.zeros(4), arr_size_thresh=10)
    assert "(4,)" in summarize(np.zeros(4), arr_size_thresh=2)


def test_summarize_non_array_values():
    assert summarize(3) == "3"
    assert summarize("abc") == "'abc'"
    assert summarize(None) == "None"


def test_format_dict_nested():
    d = {"a": 1, "b": {"c": np.zeros(2)}, 3: "x"}
    out = format_dict(d)
    assert out.startswith("{") and out.endswith("}")
    assert "'a': 1" in out
    assert "'c':" in out  # nested dict recursed
    assert "3: 'x'" in out  # non-string key unquoted
    assert format_dict(None) == "None"


def test_get_repr_expand_modes():
    d = {"k": np.arange(3)}
    short = get_repr(d)
    assert short.startswith("<")  # object.__repr__ form
    long = get_repr(d, expand=True)
    assert "'k'" in long

    class WithShort:
        def _short_repr(self):
            return "SHORT"

    assert get_repr(WithShort()) == "SHORT"


def test_full_repr_order_and_exclude():
    class Obj:
        def __init__(self):
            self.a = 1
            self.b = np.zeros(2)
            self.c = "hidden"
            self.sub = type("S", (), {"x": 42})()

    r = full_repr(Obj(), "Obj", order=["b", "sub.x"], exclude=["c"])
    assert r.startswith("Obj:")
    assert r.index("self.b") < r.index("self.a")  # ordered first
    assert "self.sub.x = 42" in r  # dotted path
    assert "hidden" not in r  # excluded


def test_full_repr_of_gp_mentions_posteriors():
    import gpyreg_tpu as gpr

    gp = gpr.GP(
        D=1,
        covariance=gpr.covariance_functions.SquaredExponential(),
        mean=gpr.mean_functions.ZeroMean(),
        noise=gpr.noise_functions.GaussianNoise(constant_add=True),
    )
    r = repr(gp)
    assert "self.D = 1" in r and "self.posteriors" in r
