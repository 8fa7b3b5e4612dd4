from .csr import SymCSRMatrix
from .dia import DiaOperator
from .ell import EllOperator

__all__ = ["DiaOperator", "EllOperator", "SymCSRMatrix"]
