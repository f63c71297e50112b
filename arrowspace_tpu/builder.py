"""ArrowSpaceBuilder: fluent configuration + 4-stage build orchestration.

Port of the reference's builder module (reference: builder.rs:20-455).
Public semantics preserved verbatim: method names, defaults
(builder.rs:59-91), the define_result_k heuristic (builder.rs:225-233),
the stage ordering and the persistence hooks (builder.rs:271-432).
"""

from __future__ import annotations

import pathlib
from typing import Dict, Optional, Tuple

from .core import ArrowSpace
from .graph import GraphLaplacian
from .sampling import SamplerType
from .taumode import TauMode, TAUDEFAULT
from .utils.log import get_logger, stage_timer

logger = get_logger("arrowspace.builder")

__all__ = ["ArrowSpaceBuilder", "ConfigValue", "PairingStrategy"]


class PairingStrategy:
    """Defined-but-unused enum kept for API parity (builder.rs:13-18)."""
    FAST_PAIR = "FastPair"
    DEFAULT = "Default"

    @staticmethod
    def cover_tree_knn(k: int):
        return ("CoverTreeKNN", k)


class ConfigValue:
    """Typed configuration value (reference: builder.rs:526-634).

    A light tagged union: kind in {Bool, Usize, F64, String, OptionF64,
    OptionUsize, OptionU64, TauMode, OptionSamplerType}.
    """

    def __init__(self, kind: str, value):
        self.kind = kind
        self.value = value

    # --- extraction helpers (builder.rs:540-577) -------------------------
    def as_bool(self):
        return self.value if self.kind == "Bool" else None

    def as_usize(self):
        return self.value if self.kind == "Usize" else None

    def as_f64(self):
        return self.value if self.kind == "F64" else None

    def as_tau_mode(self):
        return self.value if self.kind == "TauMode" else None

    def as_sampler_type(self):
        return self.value if self.kind == "OptionSamplerType" else None

    def __eq__(self, other):
        return (isinstance(other, ConfigValue) and self.kind == other.kind
                and self.value == other.value)

    def __repr__(self):
        return f"ConfigValue({self.kind}, {self.value!r})"

    def __str__(self):  # Display parity (builder.rs:637-668)
        if self.value is None:
            return "None"
        if self.kind == "Bool":
            return "true" if self.value else "false"
        if self.kind == "TauMode":
            return str(self.value)
        if self.kind == "OptionSamplerType":
            return str(self.value)
        if isinstance(self.value, float):
            r = repr(self.value)
            return r[:-2] if r.endswith(".0") else r
        return str(self.value)

    # --- JSON round-trip for metadata ------------------------------------
    def to_json(self):
        if self.kind == "TauMode":
            return {self.kind: self.value.to_config()}
        if self.kind == "OptionSamplerType":
            return {self.kind: None if self.value is None
                    else self.value.to_config()}
        return {self.kind: self.value}

    @staticmethod
    def from_json(obj) -> "ConfigValue":
        (kind, value), = obj.items()
        if kind == "TauMode":
            return ConfigValue(kind, TauMode.from_config(value))
        if kind == "OptionSamplerType":
            return ConfigValue(kind, None if value is None
                               else SamplerType.from_config(value))
        return ConfigValue(kind, value)


class ArrowSpaceBuilder:
    """Fluent builder (reference: builder.rs:20-233)."""

    def __init__(self):
        # Defaults mirror builder.rs:59-91 exactly.
        self.prebuilt_spectral = False
        self.synthesis: TauMode = TAUDEFAULT
        self.lambda_eps = 1e-3
        self.lambda_k = 6
        self.lambda_topk = 3
        self.lambda_p = 2.0
        self.lambda_sigma: Optional[float] = None  # σ := 1.0 in the kernel
        self.normalise = False
        self.sparsity_check = False
        self.sampling: Optional[SamplerType] = SamplerType.simple(0.6)
        self.cluster_max_clusters: Optional[int] = None
        self.cluster_radius = 1.0
        self.clustering_seed: Optional[int] = None
        self.deterministic_clustering = False
        self.use_dims_reduction = False
        self.rp_eps = 0.3
        self.persistence: Optional[Tuple[str, pathlib.Path]] = None

    @staticmethod
    def new() -> "ArrowSpaceBuilder":
        return ArrowSpaceBuilder()

    # ------------------ fluent configuration -----------------------------
    def with_lambda_graph(self, eps: float, k: int, topk: int, p: float,
                          sigma_override: Optional[float]) -> "ArrowSpaceBuilder":
        self.lambda_eps = eps
        self.lambda_k = k
        self.lambda_topk = topk
        self.lambda_p = p
        self.lambda_sigma = sigma_override
        return self

    def with_synthesis(self, tau_mode: TauMode) -> "ArrowSpaceBuilder":
        self.synthesis = tau_mode
        return self

    def with_normalisation(self, normalise: bool) -> "ArrowSpaceBuilder":
        self.normalise = normalise
        return self

    def with_spectral(self, compute_spectral: bool) -> "ArrowSpaceBuilder":
        logger.warning("with_spectral is an experimental feature, results "
                       "may be unprecise. Keep the default to false")
        self.prebuilt_spectral = compute_spectral
        return self

    def with_sparsity_check(self, sparsity_check: bool) -> "ArrowSpaceBuilder":
        self.sparsity_check = sparsity_check
        return self

    def with_inline_sampling(self, sampling: Optional[SamplerType]
                             ) -> "ArrowSpaceBuilder":
        self.sampling = sampling
        return self

    def with_dims_reduction(self, enable: bool,
                            eps: Optional[float] = None) -> "ArrowSpaceBuilder":
        self.use_dims_reduction = enable
        self.rp_eps = eps if eps is not None else 0.5  # builder.rs:183
        return self

    def with_seed(self, seed: int) -> "ArrowSpaceBuilder":
        """Seeded => deterministic sequential clustering (builder.rs:190-195)."""
        self.clustering_seed = seed
        self.deterministic_clustering = True
        return self

    def with_persistence(self, path, name: str) -> "ArrowSpaceBuilder":
        self.persistence = (name, pathlib.Path(path))
        return self

    def define_result_k(self) -> None:
        """topk heuristic for small k (builder.rs:225-233)."""
        if self.lambda_k <= 5:
            self.lambda_topk = 3
        elif self.lambda_k < 10:
            self.lambda_topk = 4

    # ------------------ build -------------------------------------------
    def build(self, rows) -> Tuple[ArrowSpace, GraphLaplacian]:
        """4-stage build (reference: builder.rs:249-455)."""
        # Imports deferred to avoid import cycles.
        from . import eigenmaps as em

        n_items = len(rows)
        n_features = len(rows[0]) if n_items else 0
        self.define_result_k()
        logger.info("Building ArrowSpace from %d items with %d features",
                    n_items, n_features)

        persist = self.persistence is not None
        if persist:
            from .storage import parquet as pq
            name, path = self.persistence
            path.mkdir(parents=True, exist_ok=True)
            import numpy as np
            pq.save_dense_matrix_with_builder(
                np.asarray(rows, dtype=float), path,
                f"{name}-raw_input", self)

        with stage_timer(logger, "ArrowSpaceBuilder::build"):
            # Stage 1: clustering (+ sampling, + optional projection)
            clustered = em.start_clustering(self, rows)
            aspace, centroids = clustered.aspace, clustered.centroids

            if persist:
                from .storage import parquet as pq
                import numpy as np
                name, path = self.persistence
                pq.save_dense_matrix_with_builder(
                    np.asarray(centroids), path, f"{name}-clustered-dm", self)
                pq.save_dense_matrix_with_builder(
                    np.asarray(centroids), path,
                    f"{name}-laplacian-input", self)

            # Stage 2: item-graph Laplacian (+ optional Stage 3 spectral)
            gl = em.eigenmaps(aspace, self, centroids, n_items)

            if persist:
                from .storage import parquet as pq
                name, path = self.persistence
                pq.save_sparse_matrix_with_builder(
                    gl.matrix, path, f"{name}-gl-matrix", self,
                    structural_nnz=gl.structural_nnz)
                if self.prebuilt_spectral and aspace.signals is not None:
                    pq.save_sparse_matrix_with_builder(
                        aspace.signals, path, f"{name}-aspace-signals", self,
                        structural_nnz=aspace._signals_nnz)

            # Stage 4: λτ
            em.compute_taumode(aspace, gl)

            if persist:
                from .storage import parquet as pq
                import numpy as np
                name, path = self.persistence
                pq.save_lambda_with_builder(
                    np.asarray(aspace.lambdas, dtype=np.float64), path,
                    f"{name}-lambdas", self,
                    projection=aspace.projection_matrix)

        logger.debug("ArrowSpaceBuilder configuration: %s", self)
        return aspace, gl

    # ------------------ config serialization ----------------------------
    def builder_config_typed(self) -> Dict[str, ConfigValue]:
        """Typed config map (reference: builder.rs:580-634)."""
        return {
            "prebuilt_spectral": ConfigValue("Bool", self.prebuilt_spectral),
            "lambda_eps": ConfigValue("F64", self.lambda_eps),
            "lambda_k": ConfigValue("Usize", self.lambda_k),
            "lambda_topk": ConfigValue("Usize", self.lambda_topk),
            "lambda_p": ConfigValue("F64", self.lambda_p),
            "lambda_sigma": ConfigValue("OptionF64", self.lambda_sigma),
            "normalise": ConfigValue("Bool", self.normalise),
            "sparsity_check": ConfigValue("Bool", self.sparsity_check),
            "synthesis": ConfigValue("TauMode", self.synthesis),
            "sampling": ConfigValue("OptionSamplerType", self.sampling),
            "cluster_max_clusters": ConfigValue("OptionUsize",
                                                self.cluster_max_clusters),
            "cluster_radius": ConfigValue("F64", self.cluster_radius),
            "clustering_seed": ConfigValue("OptionU64", self.clustering_seed),
            "deterministic_clustering": ConfigValue(
                "Bool", self.deterministic_clustering),
            "use_dims_reduction": ConfigValue("Bool", self.use_dims_reduction),
            "rp_eps": ConfigValue("F64", self.rp_eps),
        }

    def __str__(self) -> str:
        """Cookie-style key=value dump (reference: builder.rs:459-524)."""
        def fmt(v):
            if v is None:
                return "None"
            if isinstance(v, bool):
                return "true" if v else "false"
            if isinstance(v, float):
                r = repr(v)
                return r[:-2] if r.endswith(".0") else r
            return str(v)

        return (
            f"prebuilt_spectral={fmt(self.prebuilt_spectral)}, "
            f"lambda_eps={fmt(self.lambda_eps)}, "
            f"lambda_k={fmt(self.lambda_k)}, "
            f"lambda_topk={fmt(self.lambda_topk)}, "
            f"lambda_p={fmt(self.lambda_p)}, "
            f"lambda_sigma={fmt(self.lambda_sigma)}, "
            f"normalise={fmt(self.normalise)}, "
            f"sparsity_check={fmt(self.sparsity_check)}, "
            f"sampling={fmt(self.sampling)}, "
            f"synthesis={self.synthesis}, "
            f"cluster_max_clusters={fmt(self.cluster_max_clusters)}, "
            f"cluster_radius={fmt(self.cluster_radius)}, "
            f"clustering_seed={fmt(self.clustering_seed)}, "
            f"deterministic_clustering={fmt(self.deterministic_clustering)}, "
            f"use_dims_reduction={fmt(self.use_dims_reduction)}, "
            f"rp_eps={fmt(self.rp_eps)}, "
            f"persistence={self.persistence[1] if self.persistence else 'None'}"
        )
