from .cg import (CGOptions, METHODS, SolveInfo, cg_history_scan, cg_loop,
                 pipelined_cg_history_scan, pipelined_cg_loop, solve)

__all__ = [
    "CGOptions", "METHODS", "SolveInfo", "cg_history_scan", "cg_loop",
    "pipelined_cg_history_scan", "pipelined_cg_loop", "solve",
]
