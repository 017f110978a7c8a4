"""Multi-host startup (SURVEY.md §5.8).

The reference has no process launcher (single OS process + thread pool);
the TPU-native equivalent is ``jax.distributed.initialize`` + a mesh over
every chip of every host.  On Cloud TPU pods the coordinator/process
environment is auto-detected; elsewhere pass them explicitly.  After
``initialize_distributed`` the rest of the framework is unchanged:
``make_mesh()`` sees all global devices, pixel shards land per-host, and
the gradient all-reduce rides ICI within a slice and DCN across hosts.

Typical pod usage (same script on every host):

    from chess2rt_tpu.parallel import distributed, make_mesh
    distributed.initialize_distributed()        # auto-detect on Cloud TPU
    mesh = make_mesh()                          # all chips, all hosts
    fn = make_sharded_render_fn(static, mesh)
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Bring up the multi-host runtime; no-op when already initialized or
    when running single-process.  Returns a small info dict."""
    already = getattr(jax.distributed, "is_initialized", lambda: False)()
    if not already and (coordinator_address or num_processes):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif not already:
        try:
            jax.distributed.initialize()  # Cloud TPU auto-detection
        except RuntimeError as e:
            # "must be called before any JAX calls": the backend is already
            # initialized — too late for a multi-host bring-up, which is
            # fine single-process (the CLI calls us before any JAX op; a
            # library user who touched JAX first just runs single-process).
            # Any OTHER RuntimeError (broken coordinator on a real pod)
            # propagates: silently continuing with a wrong global device
            # view would corrupt sharding.
            if "must be called before" not in str(e):
                raise
            import warnings

            warnings.warn(
                f"jax backend already initialized; continuing single-process ({e})",
                stacklevel=2,
            )
        except ValueError as e:
            # ValueError = auto-detection found no multi-process environment
            # (the expected single-process case) — continue, but say so.
            # Anything else (RuntimeError: broken coordinator on a real pod,
            # connection failures) propagates: silently continuing with a
            # wrong global device view would corrupt sharding.
            import warnings

            warnings.warn(
                f"jax.distributed auto-detection unavailable; continuing "
                f"single-process ({e})",
                stacklevel=2,
            )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_primary() -> bool:
    """True on the host that should write checkpoints / logs."""
    return jax.process_index() == 0
