from . import scan  # noqa: F401
from . import encode  # noqa: F401
from . import decode  # noqa: F401
