from . import linalg, lqr
