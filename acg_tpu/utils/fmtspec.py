"""printf-style format specifier parsing/validation (acg/fmtspec.{h,c}).

The reference validates the user's ``--numfmt`` string before use
(fmtspec_parse, used at acg-cuda.c:766) so a bad format fails fast instead
of corrupting the Matrix Market output.  Same contract here: the CLI calls
``validate_numfmt`` on ``--numfmt`` and rejects anything that is not a
single numeric C conversion.
"""

from __future__ import annotations

import dataclasses
import re

# %[flags][width][.precision][length]conversion  (C17 fprintf grammar,
# restricted to the numeric conversions the reference accepts for values)
_FMT_RE = re.compile(
    r"""^%
        (?P<flags>[-+ #0]*)
        (?P<width>\d+|\*)?
        (?:\.(?P<precision>\d+|\*))?
        (?P<length>hh|h|ll|l|j|z|t|L)?
        (?P<conversion>[diouxXeEfFgGaA])
        $""",
    re.VERBOSE,
)

FLOAT_CONVERSIONS = set("eEfFgGaA")
INT_CONVERSIONS = set("diouxX")


@dataclasses.dataclass(frozen=True)
class FmtSpec:
    """A parsed printf conversion specification (struct fmtspec analogue)."""

    flags: str
    width: int | None      # None = unspecified, -1 = '*'
    precision: int | None  # None = unspecified, -1 = '*'
    length: str | None
    conversion: str

    @property
    def is_float(self) -> bool:
        return self.conversion in FLOAT_CONVERSIONS

    @property
    def is_integer(self) -> bool:
        return self.conversion in INT_CONVERSIONS

    def __str__(self) -> str:  # fmtspecstr analogue
        w = "" if self.width is None else ("*" if self.width == -1 else str(self.width))
        p = "" if self.precision is None else (
            ".*" if self.precision == -1 else f".{self.precision}")
        return f"%{self.flags}{w}{p}{self.length or ''}{self.conversion}"


def parse_fmtspec(s: str) -> FmtSpec:
    """Parse a single printf conversion spec; raises ValueError if invalid
    (fmtspec_parse analogue, fmtspec.h)."""
    m = _FMT_RE.match(s)
    if not m:
        raise ValueError(f"invalid format specifier: {s!r}")

    def _num(v):
        if v is None:
            return None
        return -1 if v == "*" else int(v)

    return FmtSpec(flags=m.group("flags"), width=_num(m.group("width")),
                   precision=_num(m.group("precision")),
                   length=m.group("length"), conversion=m.group("conversion"))


def validate_numfmt(s: str, field: str = "real") -> str:
    """Validate a ``--numfmt`` string for writing values of ``field``.

    Returns a numpy-compatible format string (length modifiers stripped —
    they are C-ABI concerns with no Python meaning).  Raises ValueError on
    anything unusable, mirroring the reference's early CLI rejection
    (acg-cuda.c:763-770).
    """
    spec = parse_fmtspec(s)
    if spec.width == -1 or spec.precision == -1:
        raise ValueError(f"'*' width/precision is not supported: {s!r}")
    if field == "real" and not spec.is_float:
        raise ValueError(f"format {s!r} is not a floating-point conversion")
    if field == "integer" and not spec.is_integer:
        raise ValueError(f"format {s!r} is not an integer conversion")
    return str(dataclasses.replace(spec, length=None))
