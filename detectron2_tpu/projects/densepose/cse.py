"""Continuous Surface Embeddings (CSE)
(reference projects/DensePose/densepose/modeling/cse/ + losses/embed.py).

CSE replaces the chart-based IUV parameterization with a learned embedding
space: every mesh vertex gets a D-dim embedding (direct table or
feature-projected), the head predicts a D-dim embedding per pixel, and
training pulls each annotated pixel's embedding toward its GT vertex via a
softmax over squared distances to ALL mesh vertices.

TPU fixed-shape redesign: the reference iterates variable-length annotated
point lists per mesh (losses/embed.py:70-115); here the loss takes padded
[P]-point tensors with a validity mask, and the [P, K] distance matrix is one
MXU matmul.
"""

import pickle
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "normalize_embeddings",
    "squared_euclidean_distance_matrix",
    "VertexDirectEmbedder",
    "VertexFeatureEmbedder",
    "Embedder",
    "cse_embedding_loss",
    "cse_soft_embedding_loss",
    "closest_vertices_from_embedding",
]


def normalize_embeddings(embeddings: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    """L2-normalize [N, D] embedding rows (reference cse/utils.py:27)."""
    norm = jnp.linalg.norm(embeddings, axis=-1, keepdims=True)
    return embeddings / jnp.maximum(norm, epsilon)


def squared_euclidean_distance_matrix(pts1: jnp.ndarray, pts2: jnp.ndarray) -> jnp.ndarray:
    """[M, D] x [N, D] -> [M, N] squared distances as one matmul + norms
    (reference cse/utils.py:9)."""
    cross = -2.0 * (pts1 @ pts2.T)
    return cross + (pts1 * pts1).sum(-1, keepdims=True) + (pts2 * pts2).sum(-1)[None, :]


class VertexDirectEmbedder(nn.Module):
    """A learned [num_vertices, embed_dim] table, L2-normalized on read
    (reference cse/vertex_direct_embedder.py)."""

    num_vertices: int
    embed_dim: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        emb = self.param(
            "embeddings", nn.initializers.zeros, (self.num_vertices, self.embed_dim)
        )
        return normalize_embeddings(emb)


class VertexFeatureEmbedder(nn.Module):
    """Fixed per-vertex features projected by a learned [F, D] matrix
    (reference cse/vertex_feature_embedder.py). ``train_features`` makes the
    feature table itself learnable."""

    num_vertices: int
    feature_dim: int
    embed_dim: int
    train_features: bool = False

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        if self.train_features:
            feats = self.param(
                "features", nn.initializers.zeros, (self.num_vertices, self.feature_dim)
            )
        else:
            feats = self.variable(
                "buffers",
                "features",
                lambda: jnp.zeros((self.num_vertices, self.feature_dim)),
            ).value
        w = self.param(
            "embeddings", nn.initializers.zeros, (self.feature_dim, self.embed_dim)
        )
        return normalize_embeddings(feats @ w)


class Embedder(nn.Module):
    """Per-mesh embedders, keyed by mesh name (reference cse/embedder.py).
    Call with a mesh name to get its [K, D] vertex embeddings."""

    mesh_specs: Tuple[Tuple[str, int, int], ...]  # (mesh_name, num_vertices, embed_dim)

    def setup(self):
        self._embedders = {
            name: VertexDirectEmbedder(num_vertices=n, embed_dim=d, name=f"embedder_{name}")
            for name, n, d in self.mesh_specs
        }

    @property
    def mesh_names(self):
        return tuple(name for name, _, _ in self.mesh_specs)

    def __call__(self, mesh_name: str) -> jnp.ndarray:
        return self._embedders[mesh_name]()


def cse_embedding_loss(
    pixel_embeddings: jnp.ndarray,  # [P, D] predicted embeddings at annotated points
    gt_vertex_ids: jnp.ndarray,  # [P] int, GT vertex index per point
    valid: jnp.ndarray,  # [P] bool
    mesh_vertex_embeddings: jnp.ndarray,  # [K, D]
    embdist_gauss_sigma: float = 0.01,
) -> jnp.ndarray:
    """Cross-entropy over -||e_pixel - e_vertex||^2 / sigma scores
    (reference losses/embed.py:100-115), masked mean over valid points."""
    emb = normalize_embeddings(pixel_embeddings)
    scores = squared_euclidean_distance_matrix(emb, mesh_vertex_embeddings) / (
        -embdist_gauss_sigma
    )  # [P, K]
    logp = jax.nn.log_softmax(scores, axis=-1)
    K = scores.shape[-1]
    ids = jnp.clip(gt_vertex_ids, 0, K - 1).astype(jnp.int32)
    nll = -jnp.take_along_axis(logp, ids[:, None], axis=-1)[:, 0]
    w = valid.astype(jnp.float32)
    return (nll * w).sum() / jnp.maximum(w.sum(), 1.0)


def cse_soft_embedding_loss(
    pixel_embeddings: jnp.ndarray,  # [P, D] predicted embeddings at annotated points
    gt_vertex_ids: jnp.ndarray,  # [P] int, GT vertex index per point
    valid: jnp.ndarray,  # [P] bool
    mesh_vertex_embeddings: jnp.ndarray,  # [K, D]
    geodists: jnp.ndarray,  # [K, K] mesh geodesic distances
    embdist_gauss_sigma: float = 0.01,
    geodist_gauss_sigma: float = 0.01,
) -> jnp.ndarray:
    """Soft-target variant (reference losses/soft_embed.py:95-120): instead of
    a one-hot GT vertex, the target is a softmax over geodesic distances from
    the GT vertex — nearby vertices on the mesh surface count as partially
    correct. Masked mean over valid points."""
    emb = normalize_embeddings(pixel_embeddings)
    scores = squared_euclidean_distance_matrix(emb, mesh_vertex_embeddings) / (
        -embdist_gauss_sigma
    )  # [P, K]
    logp = jax.nn.log_softmax(scores, axis=-1)
    K = scores.shape[-1]
    ids = jnp.clip(gt_vertex_ids, 0, K - 1).astype(jnp.int32)
    target = jax.nn.softmax(geodists[ids] / (-geodist_gauss_sigma), axis=-1)  # [P, K]
    nll = -(target * logp).sum(-1)
    w = valid.astype(jnp.float32)
    return (nll * w).sum() / jnp.maximum(w.sum(), 1.0)


def closest_vertices_from_embedding(
    pixel_embeddings: jnp.ndarray,  # [..., D]
    mesh_vertex_embeddings: jnp.ndarray,  # [K, D]
    chunk: int = 8192,
) -> jnp.ndarray:
    """argmin_k ||e - e_k||^2 for every pixel (reference cse/utils.py:41-80's
    chunked nearest-vertex lookup). Returns int32 [...]."""
    shape = pixel_embeddings.shape[:-1]
    flat = normalize_embeddings(pixel_embeddings.reshape(-1, pixel_embeddings.shape[-1]))
    P = flat.shape[0]
    pad = (-P) % chunk
    flat = jnp.pad(flat, ((0, pad), (0, 0)))

    def body(pts):
        d = squared_euclidean_distance_matrix(pts, mesh_vertex_embeddings)
        return jnp.argmin(d, axis=-1).astype(jnp.int32)

    out = jax.lax.map(body, flat.reshape(-1, chunk, flat.shape[-1]))
    return out.reshape(-1)[:P].reshape(shape)


def load_mesh_data(fpath: str) -> Dict[str, np.ndarray]:
    """Load a pickled mesh-data dict (vertices / faces / geodesic distances)
    from the DensePose data layout; host-side helper for evaluators."""
    with open(fpath, "rb") as f:
        return pickle.load(f)
