"""The local verifier must be at least as strict as the driver's
value hash (VERDICT r6 #1): r6 shipped a red driver row (q119) that
verify_local called green because its float normalization (%.9g) was
MORE lenient than the driver at large magnitudes — 2 decimal places
at 1e7. These tests pin the tightened normalize() so that regression
can't recur."""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from verify_local import normalize, rows_to_multiset  # noqa: E402


def test_one_ulp_at_rounding_digit_differs():
    # the exact r6 q119 failure shape: two covar_pop computations that
    # agree to 11 significant digits but round to 4 decimals on
    # opposite sides of the boundary at ~1.2e7 magnitude
    spark_side = -11864191.4402
    duck_side = -11864191.4403
    assert normalize(spark_side) != normalize(duck_side)
    # and genuinely 1 ULP apart must differ too — full precision
    x = 12345678.901234
    assert normalize(x) != normalize(math.nextafter(x, math.inf))


def test_equal_doubles_still_match():
    # identical doubles (both sides rounded identically) stay equal,
    # including negative zero vs zero textual forms
    assert normalize(0.123456) == normalize(0.123456)
    assert normalize(float("nan")) == "nan"
    a = rows_to_multiset([(1.5, "x")], ["v", "k"])
    b = rows_to_multiset([(1.5, "x")], ["v", "k"])
    assert a == b


def test_multiset_detects_single_row_diff():
    a = rows_to_multiset([(1.0, "x"), (2.0, "y")], ["v", "k"])
    b = rows_to_multiset([(1.0, "x"), (2.0000000000000004, "y")], ["v", "k"])
    assert a != b
