from .blas1 import dot, dot2, nrm2sqr

__all__ = ["dot", "dot2", "nrm2sqr"]
