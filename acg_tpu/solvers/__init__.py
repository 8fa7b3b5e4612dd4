from .cg import (CGOptions, METHODS, SolveInfo, cg_history_scan, cg_loop,
                 pipelined_cg_history_scan, pipelined_cg_loop,
                 pipelined_cg_loop_df64, pipelined_cg_loop_fused, solve)
from .dist_cg import solve_dist_general, solve_dist_stencil
from .host_cg import (solve_host_stepped, solve_host_stepped_dist,
                      solve_host_stepped_dist_general)
from .reference import solve_jax_ref, solve_scipy

__all__ = [
    "CGOptions", "METHODS", "SolveInfo", "cg_history_scan", "cg_loop",
    "pipelined_cg_history_scan", "pipelined_cg_loop",
    "pipelined_cg_loop_df64", "pipelined_cg_loop_fused", "solve",
    "solve_dist_general", "solve_dist_stencil", "solve_host_stepped",
    "solve_host_stepped_dist", "solve_host_stepped_dist_general",
    "solve_jax_ref", "solve_scipy",
]
