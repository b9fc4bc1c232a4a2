from .mesh import make_mesh
from . import collectives


def __getattr__(name):
    # lazy: parallel.tp imports models.gpt which imports modules which use
    # parallel.collectives — avoid the cycle at package import time
    if name == "tp":
        from . import tp as _tp
        return _tp
    raise AttributeError(name)
