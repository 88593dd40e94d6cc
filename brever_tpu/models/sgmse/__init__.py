from .sgmse import SGMSEp  # noqa: F401
from .sdes import SDERegistry  # noqa: F401
from .solvers import SolverRegistry  # noqa: F401
