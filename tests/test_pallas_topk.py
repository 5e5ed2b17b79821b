"""Pallas fused exact-search kernel — TPU-only correctness check against
the XLA tiled path (skipped on the CPU test mesh)."""

import jax
import numpy as np
import pytest

from pgvector_tpu.ops import pallas_topk
from pgvector_tpu.ops.metric import Metric

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="pallas kernels are TPU-only"
)


@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP])
def test_matches_xla(metric, rng):
    import jax.numpy as jnp

    from pgvector_tpu.ops import distance as D
    from pgvector_tpu.ops.topk import tiled_topk

    db = jnp.asarray(rng.normal(size=(8192, 64)).astype(np.float32))
    qs = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))
    d_p, i_p = pallas_topk.exact_topk(metric, qs, db, 10)

    def score(tile):
        return D.dense_scores(metric, qs, tile)

    d_x, i_x = tiled_topk(score, (db,), db.shape[0], 10)
    assert np.allclose(np.sort(np.asarray(d_p)), np.sort(np.asarray(d_x)),
                       rtol=1e-3, atol=1e-3)

