from . import mesh  # noqa: F401
from . import shard  # noqa: F401
from . import streaming  # noqa: F401
from . import multihost  # noqa: F401
