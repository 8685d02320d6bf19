"""Float formatting with exact parity to the reference's Rust output.

Two formatters are needed (reference: src/format/promapi.rs):

- ``rust_f64_str``: Rust's ``f64::to_string()`` — shortest round-trip
  representation, positional (never exponent), integral values WITHOUT a
  trailing ``.0`` (``42f64.to_string() == "42"``). Used for sample values
  (promapi.rs:67 ``value.to_string()``).
- ``json_f64_str``: serde_json's f64 serialization — shortest round-trip,
  integral values WITH ``.0`` (``serde_json::to_string(&42.0) == "42.0"``).
  Used for the timestamp slot (promapi.rs:67 ``ts as f64 / 1000.0``).

Python's ``repr(float)`` already produces the shortest round-trip digits
(same guarantee as Rust/Ryu); we only need to fix up notation.
"""

from __future__ import annotations

import math


def _expand_exponent(s: str) -> str:
    """Expand '1.5e-08' / '1e+21' into positional notation."""
    mantissa, _, exp_s = s.partition("e")
    exp = int(exp_s)
    neg = mantissa.startswith("-")
    if neg:
        mantissa = mantissa[1:]
    int_part, _, frac_part = mantissa.partition(".")
    digits = int_part + frac_part
    point = len(int_part) + exp  # decimal point position within `digits`
    if point <= 0:
        out = "0." + "0" * (-point) + digits
    elif point >= len(digits):
        out = digits + "0" * (point - len(digits))
    else:
        out = digits[:point] + "." + digits[point:]
    out = out.rstrip(".") if out.endswith(".") else out
    return ("-" if neg else "") + out


def rust_f64_str(v: float) -> str:
    """Rust ``f64::to_string()`` parity."""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "inf" if v > 0 else "-inf"
    s = repr(float(v))
    if "e" in s or "E" in s:
        s = _expand_exponent(s.lower())
    if s.endswith(".0"):
        s = s[:-2]
    if s == "-0":
        return "-0"
    return s


def json_f64_str(v: float) -> str:
    """serde_json f64 serialization parity (used for promapi timestamps).

    Timestamps are ~1.6e9-scale so repr never yields an exponent; keep the
    trailing ``.0`` for integral values (golden: ``1623037143.0``).
    """
    if math.isnan(v) or math.isinf(v):
        # serde_json emits null for non-finite; never happens for timestamps.
        return "null"
    s = repr(float(v))
    if "e" in s or "E" in s:
        s = _expand_exponent(s.lower())
        if "." not in s:
            s += ".0"
    return s
