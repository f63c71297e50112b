"""MIGRATION.md contract: every API the migration guide documents must
exist with the documented name — a user following the guide must never
hit an AttributeError.  (The guide maps the reference's public surface,
so this doubles as a public-API regression net.)"""

import arrowspace_tpu as at
from arrowspace_tpu import eigenmaps as em
from arrowspace_tpu.builder import ArrowSpaceBuilder
from arrowspace_tpu.core import ArrowSpace
from arrowspace_tpu.storage import parquet as pq


def test_top_level_surface():
    for name in ("ArrowSpaceBuilder", "TauMode", "SamplerType",
                 "ArrowIndex", "init", "eigenmaps"):
        assert hasattr(at, name), name


def test_builder_surface():
    b = ArrowSpaceBuilder()
    for name in ("with_lambda_graph", "with_synthesis",
                 "with_normalisation", "with_spectral",
                 "with_sparsity_check", "with_inline_sampling",
                 "with_dims_reduction", "with_seed", "with_persistence",
                 "define_result_k", "builder_config_typed"):
        assert hasattr(b, name), name
    assert "eps=" in str(b)  # cookie Display


def test_staged_eigenmaps_surface():
    for name in ("start_clustering", "eigenmaps", "compute_taumode",
                 "search", "ClusteredOutput"):
        assert hasattr(em, name), name
    # attached to ArrowSpace as in the Rust trait impl
    for name in ("start_clustering", "eigenmaps", "compute_taumode",
                 "search"):
        assert hasattr(ArrowSpace, name), name


def test_query_surface():
    for name in ("prepare_query_item", "search_lambda_aware",
                 "search_lambda_aware_hybrid", "range_search",
                 "add_items", "mul_items", "scale_item", "update_lambdas",
                 "prepare_query_items_batch", "search_lambda_aware_batch",
                 "range_search_sorted", "project_query"):
        assert hasattr(ArrowSpace, name), name


def test_storage_surface():
    for name in ("save_dense_matrix", "load_dense_matrix",
                 "save_sparse_matrix", "load_sparse_matrix",
                 "save_lambda", "load_lambda",
                 "save_arrowspace_checkpoint_with_builder",
                 "load_arrowspace_index"):
        assert hasattr(pq, name), name


def test_energy_surface():
    from arrowspace_tpu.energymaps import (EnergyParams, build_energy,
                                           search_energy,
                                           search_energy_batch)
    assert EnergyParams().allow_tall_graphs is False


def test_serving_and_parallel_surface():
    from arrowspace_tpu.index import ArrowIndex, SearchSession
    for name in ("build", "build_energy", "save", "load", "search",
                 "search_one", "search_hybrid", "range", "search_energy",
                 "make_search_session", "make_energy_session", "warmup",
                 "stats"):
        assert hasattr(ArrowIndex, name), name
    assert hasattr(SearchSession, "search_stream")
    from arrowspace_tpu.index import EnergySearchSession
    assert hasattr(EnergySearchSession, "search_stream")
    from arrowspace_tpu.precompile import warm_energy
    from arrowspace_tpu.parallel import (
        make_mesh, make_mesh_2d, distributed_build_step,
        distributed_index_step, DistributedSearchSession,
        sharded_incremental_clustering)
    from arrowspace_tpu.precompile import warm, centroid_cap_buckets
    from arrowspace_tpu.config import setup_cache, bucket_rows
