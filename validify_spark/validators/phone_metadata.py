"""Minimal numbering-plan metadata for phone validation — the vendored
subset the r4 verdict asked for (reference: validify's phone rule
delegates to the `phonenumber` crate, validify/src/validation/phone.rs:
1-11, which embeds libphonenumber metadata).

Everything here is public ITU E.164 / national-numbering-plan fact:

* ``ASSIGNED_CALLING_CODES`` — the complete set of ITU-assigned 1-3
  digit country calling codes (List of ITU-T Recommendation E.164
  assigned country codes). A '+' number whose longest-prefix calling
  code is unassigned (e.g. +999) is invalid, exactly as libphonenumber
  decides it.
* ``PLAN`` — for ~28 high-traffic calling codes, the national
  significant number's possible LENGTHS and a coarse leading-digits
  pattern, at the granularity of libphonenumber's per-country
  ``generalDesc`` (not its per-range fixedLine/mobile metadata). This
  catches the plan-invalid classes the r3/r4 verdicts called out —
  NANP numbers whose area/exchange code starts with 0 or 1, wrong
  national lengths — while staying a few hundred bytes of data.

APPROXIMATION BOUNDARY (recorded by the strict-xfail
tests/test_truth_tables.py::test_phone_per_range_boundary): coarse
patterns cannot see per-range assignments, e.g. NANP area code 999 is
unassigned but matches ``[2-9]\\d{2}``; full libphonenumber metadata
(the `phonenumbers` package, when installable) closes that and the
seam in udf_tier switches to it automatically. Within the subset the
patterns err toward OVER-acceptance (the same direction as that
documented boundary, so the xfail stays the single record of the
gap): service/short ranges are included where they change the length
set (AU 13/1300/1800, SG 800/1800), never excluded by guess.
"""

from __future__ import annotations

import re
from typing import Optional


def _codes(*specs) -> frozenset:
    out = set()
    for s in specs:
        if isinstance(s, tuple):
            lo, hi = s
            out.update(str(c) for c in range(lo, hi + 1))
        else:
            out.add(str(s))
    return frozenset(out)


# ITU-assigned country calling codes (E.164). Ranges are inclusive.
ASSIGNED_CALLING_CODES = _codes(
    1, 7,
    20, 27, (30, 34), 36, 39, (40, 41), (43, 49),
    (51, 58), (60, 66), 81, 82, 84, 86, (90, 95), 98,
    211, 212, 213, 216, 218, (220, 249), (250, 258), (260, 269),
    290, 291, 297, 298, 299,
    (350, 359), (370, 383), 385, 386, 387, 389,
    420, 421, 423,
    (500, 509), (590, 599),
    670, (672, 683), (685, 692),
    800, 808, 850, 852, 853, 855, 856, 870, 878,
    (880, 883), 886, 888,
    (960, 968), (970, 977), 979, (992, 996), 998,
)


class _Plan:
    __slots__ = ("lengths", "pattern")

    def __init__(self, lengths, pattern: Optional[str]):
        self.lengths = frozenset(lengths)
        self.pattern = re.compile(pattern) if pattern else None

    def valid(self, national: str) -> bool:
        if len(national) not in self.lengths:
            return False
        return self.pattern is None or bool(
            self.pattern.fullmatch(national))


# generalDesc-level plans: {calling code: (possible national lengths,
# coarse leading-digits pattern for the national significant number)}.
PLAN = {
    # NANP: NXX-NXX-XXXX — area and exchange codes start 2-9
    "1": _Plan({10}, r"[2-9]\d{2}[2-9]\d{6}"),
    "7": _Plan({10}, r"[3-9]\d{9}"),             # RU/KZ
    "20": _Plan({8, 9, 10}, r"[1-9]\d{7,9}"),    # EG
    "27": _Plan({9}, r"[1-9]\d{8}"),             # ZA
    "31": _Plan({9}, r"[1-9]\d{8}"),             # NL
    "33": _Plan({9}, r"[1-9]\d{8}"),             # FR
    "34": _Plan({9}, r"[5-9]\d{8}"),             # ES
    "39": _Plan(range(6, 12), None),             # IT keeps leading 0
    "44": _Plan({7, 9, 10}, r"[1-9]\d{6,9}"),    # GB
    "46": _Plan(range(7, 11), r"[1-9]\d{6,9}"),  # SE
    "48": _Plan({9}, r"[1-9]\d{8}"),             # PL
    "49": _Plan(range(6, 12), r"[1-9]\d{5,10}"),  # DE
    "52": _Plan({10}, r"[1-9]\d{9}"),            # MX
    "55": _Plan({10, 11}, r"[1-9][1-9]\d{8,9}"),  # BR
    # AU: service/short ranges (13xxxx, 1300/1800 xxx xxx) are valid
    # NSNs of 5-10 digits starting 1; geo/mobile are 9 starting 2-5/7/8
    "61": _Plan(range(5, 11), r"1\d{4,9}|[2-578]\d{8}"),
    "62": _Plan(range(8, 13), r"[1-9]\d{7,11}"),  # ID
    "63": _Plan({8, 9, 10}, r"[2-9]\d{7,9}"),    # PH
    # SG: 8-digit lines start 3/6/8/9; 800/1800 toll-free are 10/11
    "65": _Plan({8, 10, 11}, r"[3689]\d{7}|800\d{7}|1800\d{7}"),
    "81": _Plan({9, 10}, r"[1-9]\d{8,9}"),       # JP
    "82": _Plan({8, 9, 10}, r"[1-9]\d{7,9}"),    # KR
    "84": _Plan({9, 10}, r"[1-9]\d{8,9}"),       # VN
    "86": _Plan(range(7, 13), r"1[3-9]\d{9}|[1-9]\d{6,11}"),  # CN
    "90": _Plan({10}, r"[2-58]\d{9}"),           # TR
    "91": _Plan({10}, r"[1-9]\d{9}"),            # IN
    "92": _Plan({9, 10}, r"[1-9]\d{8,9}"),       # PK
    "880": _Plan({8, 9, 10}, r"[1-9]\d{7,9}"),   # BD
    "966": _Plan({9}, r"[15]\d{8}"),             # SA
    "971": _Plan({8, 9}, r"5\d{8}|[2-4679]\d{7}"),  # AE
}


def calling_code(digits: str) -> Optional[str]:
    """Longest-prefix match against the assigned-code set (calling
    codes are prefix-free at 1-3 digits, so longest-first is exact)."""
    for ln in (3, 2, 1):
        if digits[:ln] in ASSIGNED_CALLING_CODES:
            return digits[:ln]
    return None


def plan_valid(digits: str) -> bool:
    """Verdict for the digit string after '+': assigned calling code,
    then the national number against the code's plan when vendored,
    else the E.164 shape bound (total 8-15 digits)."""
    if not (8 <= len(digits) <= 15):
        return False
    cc = calling_code(digits)
    if cc is None:
        return False
    national = digits[len(cc):]
    plan = PLAN.get(cc)
    if plan is not None:
        return plan.valid(national)
    return len(national) >= 4
