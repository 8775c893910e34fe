"""KNN-MSE: the zoo's headline quality metric.

Reference: evaluation/knn_images.py — fit sklearn NearestNeighbors in the
LEARNED state space; for each (sampled) query, take its k nearest learned
neighbors and compute the MSE between their GROUND-TRUTH states and the
query's; KNN-MSE is the mean over queries. Low = the learned space preserves
ground-truth neighborhoods.

TPU-native: fused Pallas distance + streaming top-k (ops/knn_topk.py) — the
(chunk x N) distance block never leaves VMEM, vs sklearn's host KD-tree
(measured 9.4 ms vs 6.5 s on 20k samples, v5e vs this host's single core)
and 2.8x the materialize-and-lax.top_k XLA path at 100k samples (PERF.md
attempt 8). sklearn remains only as a cross-check in tests.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from srl_zoo_tpu.ops.knn_topk import knn_topk


def knn_mse(learned_states: np.ndarray, ground_truth_states: np.ndarray,
            k: int = 5, n_samples: Optional[int] = None,
            seed: int = 0, query_chunk: int = 4096
            ) -> Tuple[float, np.ndarray, np.ndarray]:
    """Returns (knn_mse, query_indices, neighbor_indices (Q, k)).

    ``n_samples`` limits the number of query points (reference samples a
    subset for the image grids); None = every point is a query. Queries are
    processed in chunks of ``query_chunk`` so device memory stays bounded at
    (chunk x N) distances even for 100k+ sample datasets.
    """
    learned = np.asarray(learned_states, np.float32)
    gt = np.asarray(ground_truth_states, np.float32)
    n = len(learned)
    if n < 2:
        raise ValueError("knn_mse needs at least 2 samples")
    # tiny debug datasets: at most n-1 non-self neighbors exist
    k = min(k, n - 1)
    if n_samples is not None and n_samples < n:
        rng = np.random.RandomState(seed)
        queries = rng.choice(n, size=n_samples, replace=False)
    else:
        queries = np.arange(n)

    # exclude self-matches: take k+1 smallest, drop the self column below
    if (jax.process_count() == 1 and jax.device_count() > 1
            and n // jax.device_count() >= k + 1):
        # single-process multi-chip: reference set sharded over the mesh,
        # candidates merged over ICI (ops/knn_topk.knn_topk_sharded);
        # query_chunk still bounds per-device memory on backends whose
        # local impl materializes distances (multi-process runs keep the
        # plain per-host path — the eval array is host-local there)
        from srl_zoo_tpu.ops.knn_topk import knn_topk_sharded
        idx = np.asarray(jax.device_get(
            knn_topk_sharded(learned[queries], learned, k + 1,
                             query_chunk=query_chunk)))
    else:
        refs = jnp.asarray(learned)
        idx_chunks = []
        for start in range(0, len(queries), query_chunk):
            q = queries[start:start + query_chunk]
            idx = knn_topk(jnp.asarray(learned[q]), refs, k + 1)
            idx_chunks.append(np.asarray(jax.device_get(idx)))
        idx = np.concatenate(idx_chunks, axis=0)
    # self-exclusion, vectorized (an O(Q*k) Python loop here dominated at
    # 100k+ queries): drop the self column when present, else the (k+1)-th
    keep = idx != queries[:, None]
    order = np.argsort(~keep, axis=1, kind="stable")  # kept cols first,
    neighbor_idx = np.take_along_axis(idx, order[:, :k], axis=1)  # dist order

    gt_q = gt[queries][:, None, :]          # (Q, 1, d)
    gt_n = gt[neighbor_idx]                 # (Q, k, d)
    score = float(np.mean(np.square(gt_q - gt_n)))
    return score, queries, neighbor_idx


def save_neighbor_grids(data_folder: str, images_path: np.ndarray,
                        queries: np.ndarray, neighbor_idx: np.ndarray,
                        out_folder: str, n_grids: int = 5) -> None:
    """Save query-vs-neighbors image grids for visual inspection
    (reference: knn_images.py image grid output)."""
    import os

    from srl_zoo_tpu.data.loader import _decode_resize
    from srl_zoo_tpu.plotting.agg import agg_subplots

    os.makedirs(out_folder, exist_ok=True)
    k = neighbor_idx.shape[1]
    for g in range(min(n_grids, len(queries))):
        fig, axes = agg_subplots(1, k + 1, figsize=(2 * (k + 1), 2.4))
        ids = [queries[g]] + list(neighbor_idx[g])
        titles = ["query"] + [f"nn{j + 1}" for j in range(k)]
        for ax, i, title in zip(axes, ids, titles):
            from srl_zoo_tpu.data.schema import resolve_image_path
            path = resolve_image_path(data_folder, str(images_path[i]))
            try:
                ax.imshow(_decode_resize(path, (224, 224)))
            except FileNotFoundError:
                ax.text(0.5, 0.5, "no image", ha="center")
            ax.set_title(title, fontsize=8)
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(os.path.join(out_folder, f"knn_grid_{g}.png"), dpi=80)
