"""Scalar parity helpers: human file sizes, time intervals, misc (C1-C4,
C23 in SURVEY.md §2.9).

These are driver-side config-parsing utilities in the reference
(FileSize telegram2elastic.py:29-55, TimeInterval :87-144, prepare_chats
:584-599); they parameterize plans (rule size limits, periodic-import
windows), so they live here as plain Python with the exact semantics the
reference's unit tests pin down (test_telegram2elastic.py:6-53), plus
Column-expression equivalents where an operator needs them at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_SIZE_UNITS = ["", "K", "M", "G", "T", "P"]


def parse_file_size(text: str) -> int:
    """'1.5MB' -> 1572864 (base-1024; trailing 'B' optional; case-insensitive).
    Mirrors FileSize.get_bytes (telegram2elastic.py:32-44) semantics,
    pinned by test_telegram2elastic.py:7-18."""
    s = text.strip().upper()
    if s.endswith("B"):
        s = s[:-1]
    m = re.fullmatch(r"([0-9]*\.?[0-9]+)\s*([KMGTP]?)", s)
    if not m:
        raise ValueError(f"unparseable size: {text!r}")
    value, unit = float(m.group(1)), m.group(2)
    return int(value * (1024 ** _SIZE_UNITS.index(unit)))


def format_file_size(n: int) -> str:
    """1572864 -> '1.5MB' ({:3.1f} trimmed; telegram2elastic.py:46-55)."""
    value = float(n)
    for unit in _SIZE_UNITS:
        if abs(value) < 1024.0:
            return f"{value:3.1f}{unit}B".strip()
        value /= 1024.0
    return f"{value:3.1f}EB".strip()


_INTERVAL_UNITS = {
    "y": 365 * 86400,
    "mo": 30 * 86400,
    "w": 7 * 86400,
    "d": 86400,
    "h": 3600,
    "m": 60,
    "s": 1,
}
_INTERVAL_RE = re.compile(r"([0-9]+)\s*(mo|[ywdhms])", re.IGNORECASE)


def parse_interval_seconds(text: str) -> int:
    """'1d12h' -> 129600; unit-order independent ('2m1mo' == '1mo2m'),
    separators [\\s,_-] ignored, case-insensitive — TimeInterval semantics
    (telegram2elastic.py:93-119, tests :35-42)."""
    s = re.sub(r"[\s,_-]+", "", text.lower())
    total = 0
    consumed = 0
    for m in _INTERVAL_RE.finditer(s):
        total += int(m.group(1)) * _INTERVAL_UNITS[m.group(2)]
        consumed += len(m.group(0))
    if consumed != len(s):
        raise ValueError(f"unparseable interval: {text!r}")
    return total


def format_interval(seconds: int) -> str:
    """129600 -> '1 day, 12 hours' (divmod cascade w/ pluralization,
    telegram2elastic.py:121-141)."""
    names = [
        ("year", 365 * 86400),
        ("month", 30 * 86400),
        ("week", 7 * 86400),
        ("day", 86400),
        ("hour", 3600),
        ("minute", 60),
        ("second", 1),
    ]
    parts = []
    rem = int(seconds)
    for name, size in names:
        q, rem = divmod(rem, size)
        if q:
            parts.append(f"{q} {name}" + ("s" if q != 1 else ""))
    return ", ".join(parts) if parts else "0 seconds"


def prepare_chat_ref(value: str) -> str | int:
    """'@name' -> 'name'; numeric string -> int (prepare_chats,
    telegram2elastic.py:584-599)."""
    v = value.strip()
    if v.startswith("@"):
        return v[1:]
    try:
        return int(v)
    except ValueError:
        return v


def human_size_col(n: Column) -> Column:
    """Column-expression bytes->human (C2) for result projections."""
    unit_idx = F.when(n <= 0, F.lit(0)).otherwise(
        F.least(F.floor(F.log(1024.0, n.cast("double"))), F.lit(5)).cast("int")
    )
    units = F.array(*[F.lit(u + "B") for u in _SIZE_UNITS])
    scaled = n.cast("double") / F.pow(F.lit(1024.0), unit_idx.cast("double"))
    return F.concat(
        F.format_number(scaled, 1), F.element_at(units, unit_idx + 1)
    )
