from .checkpoint import load_pytree, save_pytree
from .inverse import InverseProblem, fit

__all__ = ["InverseProblem", "fit", "save_pytree", "load_pytree"]
