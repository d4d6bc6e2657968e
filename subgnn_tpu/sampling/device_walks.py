"""Device-side triangular random walks (stateless jax.random, vectorized).

The walk semantics follow the host sampler (sampling/walks.py, reference:
SubGNN/anchor_patch_samplers.py:49-113): with probability rw_beta step to a
neighbor that closes a triangle with the previous node, else to a
non-triangle neighbor; dead ends terminate the walk.

TPU-native formulation: the graph's CSR rows are padded to a fixed
max-degree matrix (n_nodes+1, max_deg) so every step is a dense gather; the
triangle test is a dense (max_deg, max_deg) membership compare of curr's
neighbors against prev's row; all n_walks advance in lockstep inside a
fully-unrolled lax.scan with per-(seed, walk) stateless keys.
Distribution-equivalent to the host sampler (different stream).

Used for the offline structure-anchor pool sampling at scale; the host /
C++ samplers remain for restricted (per-patch) walks where membership
tables change per patch.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import CSRGraph

PAD_VALUE = 0


def padded_neighbor_table(graph: CSRGraph, max_deg: int | None = None):
    """(n_nodes+1, max_deg) int32 neighbor ids, 0-padded, rows sorted
    ascending with pads at the FRONT so searchsorted stays valid on the
    sorted suffix; plus (n_nodes+1,) degrees."""
    deg = graph.degrees
    if max_deg is None:
        max_deg = int(deg.max())
    # clamp degrees to the truncated row width: the samplers index
    # row[max_deg - 1 - u % deg], so an unclamped hub degree would index
    # past the kept neighbors (JAX clamps to 0 = the PAD slot, silently
    # walking to PAD)
    deg = np.minimum(deg, max_deg)
    table = np.zeros((graph.n_nodes + 1, max_deg), dtype=np.int32)
    for v in range(1, graph.n_nodes + 1):
        nbrs = graph.neighbors(v)[:max_deg]
        table[v, max_deg - len(nbrs):] = nbrs  # pads (0) sort first anyway
    return jnp.asarray(table), jnp.asarray(deg.astype(np.int32))


@functools.partial(jax.jit, static_argnames=("walk_len", "n_walks"))
def triangular_walks_device(nbr_table, degrees, start_nodes, key, *,
                            walk_len: int, n_walks: int,
                            rw_beta: float) -> jnp.ndarray:
    """(n_walks, walk_len) int32 walks over the full graph, PAD=0."""
    n_start = start_nodes.shape[0]
    max_deg = nbr_table.shape[1]
    keys = jax.random.split(key, n_walks)

    def sample_uniform(k, row, count):
        """Uniform choice among the last `count` entries of a padded row."""
        idx = jax.random.randint(k, (), 0, jnp.maximum(count, 1))
        return row[max_deg - 1 - idx]

    def one_walk(k):
        k0, k1, kw = jax.random.split(k, 3)
        prev = start_nodes[jax.random.randint(k0, (), 0, n_start)]
        d_prev = degrees[prev]
        curr = sample_uniform(k1, nbr_table[prev], d_prev)
        alive0 = d_prev > 0

        def step(carry, kt):
            prev, curr, alive = carry
            ka, kb = jax.random.split(kt)
            row = nbr_table[curr]                      # (max_deg,)
            d = degrees[curr]
            valid = row != PAD_VALUE
            # triangle test: neighbor u of curr also adjacent to prev.
            # Broadcast membership compare instead of searchsorted — the
            # vmapped binary search lowers to a chain of dependent dynamic
            # gathers, while the (max_deg, max_deg) compare is one dense
            # VPU op per step.
            prev_row = nbr_table[prev]
            tri = valid & (row[:, None] == prev_row[None, :]).any(axis=-1)
            non_tri = valid & ~tri
            n_tri = tri.sum()
            n_non = non_tri.sum()
            take_tri = jnp.where(
                n_tri == 0, False,
                jnp.where(n_non == 0, True,
                          jax.random.uniform(ka) <= rw_beta))
            weights = jnp.where(take_tri, tri, non_tri).astype(jnp.float32)
            # uniform over the selected class via Gumbel-max on the mask
            g = jax.random.gumbel(kb, (max_deg,))
            nxt = row[jnp.argmax(jnp.where(weights > 0, g, -jnp.inf))]
            alive_next = alive & (d > 0) & ((n_tri + n_non) > 0)
            out = jnp.where(alive_next, nxt, PAD_VALUE)
            new_prev = jnp.where(alive_next, curr, prev)
            new_curr = jnp.where(alive_next, nxt, curr)
            return (new_prev, new_curr, alive_next), out

        step_keys = jax.random.split(kw, walk_len - 2)
        # walk lengths are <=26: full unroll removes while-loop overhead
        (_, _, _), rest = jax.lax.scan(step, (prev, curr, alive0), step_keys,
                                       unroll=True)
        second = jnp.where(alive0, curr, PAD_VALUE)
        return jnp.concatenate([jnp.stack([prev, second]), rest])

    return jax.vmap(one_walk)(keys)


def sample_structure_pool_device(graph: CSRGraph, hp, seed: int,
                                 max_sim_epochs: int) -> np.ndarray:
    """Device-sampled structure anchor-patch pool (drop-in for
    sampling.walks.sample_structure_anchor_patches, different RNG stream)."""
    n_samples = max_sim_epochs * hp.n_anchor_patches_structure * hp.n_layers
    nbr_table, degrees = padded_neighbor_table(graph)
    starts = jnp.asarray(graph.node_ids())
    walks = triangular_walks_device(
        nbr_table, degrees, starts, jax.random.PRNGKey(seed),
        walk_len=hp.sample_walk_len, n_walks=n_samples, rw_beta=hp.rw_beta)
    out = np.asarray(walks, dtype=np.int32)
    # trim trailing all-pad columns like the host sampler's max-length pad
    used = np.nonzero((out != PAD_VALUE).any(axis=0))[0]
    return out[:, : used.max() + 1] if used.size else out[:, :1]
