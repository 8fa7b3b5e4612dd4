"""L0 utilities: sorting, prefix sums, printf-format handling.

The analogues of the reference's utility layer (SURVEY.md §1 L0):
acg/sort.{h,c}, acg/prefixsum.{h,c}, acg/fmtspec.{h,c}.
"""

from .fmtspec import FmtSpec, parse_fmtspec, validate_numfmt  # noqa: F401
from .prefixsum import exclusive_prefixsum, inclusive_prefixsum  # noqa: F401
from .sort import radix_sort, radix_sort_pair  # noqa: F401
