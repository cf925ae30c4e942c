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
    "EmbedderSpec",
    "embedder_specs_from_cfg",
    "embedder_init_files_from_cfg",
    "load_embedder_features",
    "cse_embedding_loss",
    "cse_soft_embedding_loss",
    "closest_vertices_from_embedding",
    "sample_fg_pixels",
    "pix_to_shape_cycle_loss",
    "shape_to_shape_cycle_loss",
    "build_cycle_mesh_data",
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


#: canonical per-mesh embedder spec:
#: (mesh_name, type, num_vertices, feature_dim, embed_dim,
#:  features_trainable, is_trainable)
#: type is "vertex_direct" (learned [K, D] table) or "vertex_feature"
#: (fixed/learned [K, F] LBO features projected by a learned [F, D] matrix)
EmbedderSpec = Tuple[str, str, int, int, int, bool, bool]


def embedder_specs_from_cfg(cfg) -> Tuple[EmbedderSpec, ...]:
    """Normalize cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBEDDERS into canonical
    specs. Accepts BOTH layouts:

    * the reference's dict form (reference cse/embedder.py:31-66)::

        EMBEDDERS:
          "smpl_27554":
            TYPE: vertex_feature
            NUM_VERTICES: 27554
            FEATURE_DIM: 256
            FEATURES_TRAINABLE: False
            IS_TRAINABLE: True
            INIT_FILE: "..."

    * the legacy list-of-pairs form ``[["smpl_27554", 27554]]`` (a trainable
      vertex_direct embedder per entry).
    """
    h = cfg.MODEL.ROI_DENSEPOSE_HEAD
    embed_dim = int(h.CSE.EMBED_SIZE)
    raw = h.CSE.EMBEDDERS
    if not raw:
        # empty -> no embedders, matching build_densepose_embedder's None
        # (reference densepose/modeling/build.py:87-89); the abstract cse
        # base config builds a model without embedder parameters
        return ()
    specs = []
    if isinstance(raw, (list, tuple)):
        for name, n in raw:
            specs.append((str(name), "vertex_direct", int(n), 0, embed_dim, False, True))
    else:  # CfgNode / mapping: the reference layout
        for name in sorted(raw.keys()):
            s = raw[name]
            get = (lambda k, d: s.get(k, d)) if hasattr(s, "get") else (lambda k, d: getattr(s, k, d))
            specs.append(
                (
                    str(name),
                    str(get("TYPE", "vertex_direct")),
                    int(get("NUM_VERTICES", 0)),
                    int(get("FEATURE_DIM", 0)),
                    embed_dim,
                    bool(get("FEATURES_TRAINABLE", False)),
                    bool(get("IS_TRAINABLE", True)),
                )
            )
    return tuple(specs)


def embedder_init_files_from_cfg(cfg) -> Dict[str, str]:
    """mesh_name -> INIT_FILE for specs that declare one (dict layout only)."""
    raw = cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBEDDERS
    if isinstance(raw, (list, tuple)):
        return {}
    out = {}
    for name in raw.keys():
        s = raw[name]
        f = s.get("INIT_FILE", "") if hasattr(s, "get") else getattr(s, "INIT_FILE", "")
        if f:
            out[str(name)] = str(f)
    return out


def _normalize_spec(spec) -> EmbedderSpec:
    if len(spec) == 3:  # legacy (name, num_vertices, embed_dim)
        name, n, d = spec
        return (str(name), "vertex_direct", int(n), 0, int(d), False, True)
    return spec


class Embedder(nn.Module):
    """Per-mesh embedders, keyed by mesh name (reference cse/embedder.py).
    Call with a mesh name to get its [K, D] vertex embeddings. Non-trainable
    embedders (IS_TRAINABLE False) return stop_gradient'ed embeddings — the
    functional analogue of the reference's ``requires_grad_(False)``."""

    mesh_specs: Tuple[Tuple, ...]  # EmbedderSpec (or legacy 3-tuples)

    def setup(self):
        embedders = {}
        for spec in self.mesh_specs:
            name, etype, n, f, d, feats_train, _ = _normalize_spec(spec)
            if etype == "vertex_feature":
                embedders[name] = VertexFeatureEmbedder(
                    num_vertices=n,
                    feature_dim=f,
                    embed_dim=d,
                    train_features=feats_train,
                    name=f"embedder_{name}",
                )
            elif etype == "vertex_direct":
                embedders[name] = VertexDirectEmbedder(
                    num_vertices=n, embed_dim=d, name=f"embedder_{name}"
                )
            else:
                raise ValueError(f"Unexpected embedder type {etype!r} for mesh {name!r}")
        self._embedders = embedders
        self._trainable = {
            _normalize_spec(s)[0]: _normalize_spec(s)[6] for s in self.mesh_specs
        }

    @property
    def mesh_names(self):
        return tuple(_normalize_spec(s)[0] for s in self.mesh_specs)

    def has_embeddings(self, mesh_name: str) -> bool:
        return mesh_name in self._embedders

    def __call__(self, mesh_name: str) -> jnp.ndarray:
        emb = self._embedders[mesh_name]()
        if not self._trainable[mesh_name]:
            emb = jax.lax.stop_gradient(emb)
        return emb


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


def load_embedder_features(variables, specs, init_files: Dict[str, str], prefix=("buffers",)):
    """Fill vertex_feature embedders' fixed feature buffers from their
    INIT_FILE pickles (reference cse/vertex_feature_embedder.py:55-70 loads
    {"features": [K, F]} at construction). Host-side, best-effort: entries
    whose INIT_FILE is not a readable local path (e.g. an unfetched URL in
    this zero-egress environment) are skipped with a log line. Returns the
    updated variables pytree."""
    import logging
    import os

    logger = logging.getLogger(__name__)
    variables = dict(variables)
    for spec in specs:
        name, etype, n, f, _, feats_train, _ = _normalize_spec(spec)
        fpath = init_files.get(name, "")
        if etype != "vertex_feature" or not fpath:
            continue
        if not os.path.isfile(fpath):
            logger.info("Embedder %s: INIT_FILE %s not a local file, skipping", name, fpath)
            continue
        with open(fpath, "rb") as fh:
            data = pickle.load(fh, encoding="latin1")
        feats = np.asarray(data["features"] if isinstance(data, dict) else data, np.float32)
        assert feats.shape == (n, f), (name, feats.shape, (n, f))
        coll = "params" if feats_train else "buffers"
        tree = variables
        # walk to roi_heads' embedder scope wherever it lives in the tree
        def place(d):
            for k, v in d.items():
                if k == f"embedder_{name}" and isinstance(v, dict) and "features" in v:
                    v["features"] = jnp.asarray(feats)
                    return True
                if isinstance(v, dict) and place(v):
                    return True
            return False

        import jax.tree_util as jtu  # noqa: F401  (kept for symmetry with callers)

        target = tree.get(coll, {})
        target = jax.tree_util.tree_map(lambda x: x, target)  # shallow-ish copy
        if not place(target):
            logger.warning("Embedder %s: no features buffer found in %r collection", name, coll)
        else:
            variables[coll] = target
    return variables


# ---------------------------------------------------------------------------
# Cycle-consistency losses (the reference's "Discovering Relationships between
# Object Categories via Universal Canonical Maps" evolution losses)
# ---------------------------------------------------------------------------


def _matrix_norm(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """torch.norm(X, p) semantics on a matrix: entrywise p-norm
    (p=2 -> Frobenius)."""
    if p == 2:
        return jnp.sqrt(jnp.maximum((x * x).sum(), 1e-12))
    return (jnp.abs(x) ** p).sum() ** (1.0 / p)


def sample_fg_pixels(rng: jnp.ndarray, fg_mask: jnp.ndarray, num: int):
    """Uniform sample WITHOUT replacement of ``num`` foreground pixel indices
    from a [S, S] mask, fixed output shape (TPU redesign of the reference's
    ``randperm(num_fg)[:num]``, cycle_pix2shape.py:32-39, via the Gumbel
    top-k trick — with uniform logits it is exactly a uniform sample without
    replacement). Returns (idx [num] int32 flat indices, valid [num] bool);
    when the mask has fewer than ``num`` fg pixels the surplus slots are
    marked invalid instead of shrinking the shape."""
    flat = fg_mask.reshape(-1).astype(jnp.float32)
    logits = jnp.where(flat > 0, 0.0, -jnp.inf)
    g = logits + jax.random.gumbel(rng, flat.shape)
    _, idx = jax.lax.top_k(g, num)
    return idx.astype(jnp.int32), flat[idx] > 0


def build_cycle_mesh_data(
    specs,
    max_num_vertices: int,
    seed: int = 0,
    geodists: Optional[Dict[str, np.ndarray]] = None,
):
    """Per-mesh (name, vertex_idx, geodists_submatrix) tuples for the
    shape-to-shape cycle loss. TPU redesign of the reference's per-step
    ``sample_random_indices`` (cycle_shape2shape.py:88-96): the vertex
    subsample is drawn ONCE here with a fixed seed so the [N, N] geodist
    submatrices are compile-time constants; the random mesh PAIR per step
    stays stochastic (lax.switch on a sampling rng in the head).

    ``geodists`` maps mesh name -> full [K, K] geodesic matrix; names absent
    from it are loaded from the MeshCatalog's staged files (create_mesh).
    """
    out = []
    for li, spec in enumerate(specs):
        name, _, n, _, _, _, _ = _normalize_spec(spec)
        if geodists is not None and name in geodists:
            geo = np.asarray(geodists[name], np.float32)
        else:
            from detectron2_tpu.projects.densepose.meshes import create_mesh

            geo = create_mesh(name).get_geodists()
        if max_num_vertices > 0 and n > max_num_vertices:
            rs = np.random.RandomState(seed + li)
            idx = np.sort(rs.choice(n, max_num_vertices, replace=False))
            geo = geo[np.ix_(idx, idx)]
            idx = jnp.asarray(idx, jnp.int32)
        else:
            idx = None
        out.append((name, idx, jnp.asarray(geo, jnp.float32)))
    return tuple(out)


def pix_to_shape_cycle_loss(
    pixel_embeddings: jnp.ndarray,  # [S, S, D] one instance's embedding map
    fg_mask: jnp.ndarray,  # [S, S] GT foreground mask
    mesh_vertex_embeddings: jnp.ndarray,  # [K, D] (normalized)
    rng: jnp.ndarray,
    num_pixels: int = 100,
    temperature_pix_to_vertex: float = 0.05,
    temperature_vertex_to_pix: float = 0.05,
    norm_p: int = 2,
) -> jnp.ndarray:
    """Pixel->vertex->pixel cycle-consistency for one instance against one
    mesh (reference losses/cycle_pix2shape.py:122-145): round-trip soft
    correspondence through the mesh should land near the starting pixel, so
    the loss is ||pixel_dists * C_cycle||_p with pixel_dists the squared
    pixel-grid distances of the sampled points. (The reference's PIXEL_SIGMA
    config is read but unused in its forward; mirrored here by not taking
    it.) Invalid sampled slots (mask smaller than ``num_pixels``) contribute
    zero via dist-row masking."""
    S = fg_mask.shape[-1]
    idx, valid = sample_fg_pixels(rng, fg_mask, num_pixels)
    rows = (idx // S).astype(jnp.float32)
    cols = (idx % S).astype(jnp.float32)
    coords = jnp.stack([rows, cols], -1)  # [M, 2]
    pixel_dists = squared_euclidean_distance_matrix(coords, coords)  # [M, M]
    v = valid.astype(jnp.float32)
    pixel_dists = pixel_dists * v[:, None] * v[None, :]

    D = pixel_embeddings.shape[-1]
    emb = normalize_embeddings(pixel_embeddings.reshape(-1, D)[idx])  # [M, D]
    sim = emb @ mesh_vertex_embeddings.T  # [M, K]
    c_pix_vertex = jax.nn.softmax(sim / temperature_pix_to_vertex, axis=1)
    c_vertex_pix = jax.nn.softmax(sim.T / temperature_vertex_to_pix, axis=1)
    c_cycle = c_pix_vertex @ c_vertex_pix  # [M, M]
    return _matrix_norm(pixel_dists * c_cycle, norm_p)


def shape_to_shape_cycle_loss(
    embeddings_1: jnp.ndarray,  # [N1, D] (normalized) vertex embeddings, mesh 1
    geodists_1: jnp.ndarray,  # [N1, N1] geodesic distances, mesh 1
    embeddings_2: jnp.ndarray,  # [N2, D]
    geodists_2: jnp.ndarray,  # [N2, N2]
    temperature: float = 0.05,
    norm_p: int = 2,
) -> jnp.ndarray:
    """Mesh<->mesh cycle-consistency for one pair of shapes (reference
    losses/cycle_shape2shape.py:97-121, after "Mapping in a Cycle"): soft
    correspondences 1->2->1 and 2->1->2 should stay geodesically close to
    the identity. Vertex subsampling (the reference's per-step randperm,
    MAX_NUM_VERTICES) is the caller's job — pass pre-subsampled embeddings
    and the matching geodist submatrix."""
    sim_12 = embeddings_1 @ embeddings_2.T
    c_12 = jax.nn.softmax(sim_12 / temperature, axis=1)
    c_21 = jax.nn.softmax(sim_12.T / temperature, axis=1)
    c_11 = c_12 @ c_21
    c_22 = c_21 @ c_12
    return _matrix_norm(geodists_1 * c_11, norm_p) + _matrix_norm(geodists_2 * c_22, norm_p)
