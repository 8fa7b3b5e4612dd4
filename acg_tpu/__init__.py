"""acg_tpu — a TPU-native distributed conjugate-gradient solver framework.

From-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
GPU suite aCG (see SURVEY.md / DESIGN.md).
"""

from .config import ensure_x64

# The reference is a double-precision code; enable x64 before anything
# builds JAX arrays (override with ACG_TPU_X64=0).
ensure_x64()

from .config import F32, F32_F64, F64, Precision  # noqa: E402
from .core.csr import SymCSRMatrix  # noqa: E402
from .core.dia import DiaOperator  # noqa: E402
from .core.ell import EllOperator  # noqa: E402
from .core.vector import PackedVector  # noqa: E402
from .solvers.cg import CGOptions, SolveInfo, solve  # noqa: E402
from .solvers.dist_cg import solve_dist_general, solve_dist_stencil  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "CGOptions", "DiaOperator", "EllOperator", "F32", "F32_F64", "F64",
    "PackedVector", "Precision", "SolveInfo", "SymCSRMatrix", "ensure_x64",
    "solve", "solve_dist_general", "solve_dist_stencil",
]
