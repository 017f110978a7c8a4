from .distributed import initialize_distributed, is_primary
from .mesh import (
    make_mesh,
    make_sharded_render_fn,
    make_sharded_value_and_grad,
    render_frame_distributed,
)

__all__ = [
    "initialize_distributed",
    "is_primary",
    "make_mesh",
    "make_sharded_render_fn",
    "make_sharded_value_and_grad",
    "render_frame_distributed",
]
