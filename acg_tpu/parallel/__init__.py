from .mesh import AXIS, make_mesh, row_sharding, slab_sharding, stacked_sharding
from .comm import Comm, CommType, make_comm
from .halo import allgather_halo, alltoall_halo, stencil_halo
from .multihost import init_multihost, process_info
from .dist import (GeneralPlanStatic, StencilPlan, general_spmv_local,
                   make_stencil_plan, pad_stencil_operand,
                   pad_stencil_vector, stencil_spmv_local)

__all__ = [
    "AXIS", "Comm", "CommType", "GeneralPlanStatic", "StencilPlan",
    "allgather_halo", "alltoall_halo", "init_multihost", "make_comm",
    "process_info",
    "general_spmv_local", "make_mesh", "make_stencil_plan",
    "pad_stencil_operand", "pad_stencil_vector", "row_sharding",
    "slab_sharding", "stacked_sharding", "stencil_halo", "stencil_spmv_local",
]
