from .mesh import AXIS, make_mesh, row_sharding, slab_sharding, stacked_sharding
from .halo import allgather_halo, stencil_halo
from .dist import (GeneralPlanStatic, StencilPlan, general_spmv_local,
                   make_stencil_plan, pad_stencil_operand,
                   pad_stencil_vector, stencil_spmv_local)

__all__ = [
    "AXIS", "GeneralPlanStatic", "StencilPlan", "allgather_halo",
    "general_spmv_local", "make_mesh", "make_stencil_plan",
    "pad_stencil_operand", "pad_stencil_vector", "row_sharding",
    "slab_sharding", "stacked_sharding", "stencil_halo", "stencil_spmv_local",
]
