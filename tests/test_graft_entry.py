"""Driver entry points compile-check (CPU)."""

import jax
import jax.numpy as jnp


def test_entry_jittable():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    # One PCG step from W=0 must move the iterate and stay finite.
    assert out.W.shape == args[0].W.shape
    assert bool(jnp.all(jnp.isfinite(out.W)))
    assert float(jnp.linalg.norm(out.W)) > 0.0
