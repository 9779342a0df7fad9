from . import gather  # noqa: F401
from . import scatter  # noqa: F401
from . import ffill  # noqa: F401
