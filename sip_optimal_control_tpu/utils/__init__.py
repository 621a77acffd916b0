from .derivative_check import check_derivatives
from .profiling import trace_solve
