"""YAML config ingestion (SURVEY.md §2 A12) — the reference's user entry
point for configuring a sweep.

Mirrors the reference's loader semantics exactly (utils_grid_search.py:90-139):
``load_config`` is yaml.safe_load with a default-config fallback on missing
files; ``load_all_input_configs`` merges filter_config.yaml + params_config.yaml
into one flat dict — active-filter selection with a default triple, (ranges,
name) pairs, global/results settings splatted in, then ``setdefault`` defaults.

On top of the reference-shaped dict, three engine adapters:
``filter_predicates`` compiles the YAML rating ranges into pushdown-able
``rating_bucket IN (...)`` predicates, and ``ivf_grid_from_config`` /
``lsh_grid_from_config`` map the CAGRA/HNSW knob lists onto this engine's
grid families per the SURVEY §2 I1/I2 knob correspondence.
"""

from __future__ import annotations

import os

import yaml
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.filters import BUCKETS

# NOTE: operators.gridsearch imports sources.sinks, so importing it at module
# scope here would be circular (sources package -> config -> gridsearch ->
# sources). The grid adapters import it lazily instead.

__all__ = [
    "load_config",
    "load_all_input_configs",
    "filter_predicates",
    "ivf_grid_from_config",
    "lsh_grid_from_config",
]

#: reference defaults (utils_grid_search.py:112-115)
_DEFAULTS = {
    "num_queries": 10000,
    "batch_size": 100,
    "num_workers_params": 1,
    "num_workers_throughput": 2,
    "persistent": False,
    "run_time_seconds": 30,
    "results_dir": "comprehensive_comparison_results-test",
    "save_intermediate": True,
    "cleanup_pause_seconds": 30,
}


def load_config(config_path: str, default_config: dict | None = None) -> dict:
    """YAML load with default fallback (reference: utils_grid_search.py:123-139)."""
    try:
        with open(config_path) as f:
            return yaml.safe_load(f)
    except FileNotFoundError:
        if default_config:
            return default_config
        raise


def load_all_input_configs(config_path: str) -> dict:
    """Merge filter_config.yaml + params_config.yaml (reference:
    utils_grid_search.py:90-121): active-filter selection (defaulting to the
    low/high/mid triple), (ranges, name) pairs for each active filter,
    global_settings/results_settings flattened in, then defaults applied."""
    filter_config = load_config(os.path.join(config_path, "filter_config.yaml"))
    params_config = load_config(os.path.join(config_path, "params_config.yaml"))

    active_filters = filter_config.get(
        "active_filters", ["low_rated", "high_rated", "mid_rated"]
    )
    filter_configurations = [
        (filter_config["filter_configurations"][name]["ranges"], name)
        for name in active_filters
        if name in filter_config["filter_configurations"]
    ]

    config = {
        "filter_configurations": filter_configurations,
        "global_filter_settings": filter_config.get("global_filter_settings", {}),
        "rating_distribution": filter_config.get("rating_distribution", {}),
        "cagra_params": params_config["cagra_params"],
        "hnsw_params": params_config["hnsw_params"],
        "data_sizes": params_config.get("data_sizes", [5010000]),
        **params_config.get("global_settings", {}),
        **params_config.get("results_settings", {}),
    }
    for key, default in _DEFAULTS.items():
        config.setdefault(key, default)
    return config


def filter_predicates(config: dict) -> dict[str, Column]:
    """Compile each active filter's YAML rating ranges into a Spark predicate
    over the ``rating_bucket`` column (the range labels in
    filter_config.yaml:1-47 are exactly this engine's bucket labels).
    Unknown range labels fail loudly at compile time, not as empty results."""
    known = {b for b, _ in BUCKETS}
    out: dict[str, Column] = {}
    for ranges, name in config["filter_configurations"]:
        unknown = set(ranges) - known
        if unknown:
            raise ValueError(f"filter {name!r} has unknown rating ranges {sorted(unknown)}")
        out[name] = F.col("rating_bucket").isin(list(ranges))
    return out


def _take(values: list, limit_values: int | None) -> list:
    return values if limit_values is None else values[:limit_values]


def ivf_grid_from_config(config: dict, limit_values: int | None = None):
    """cagra_params -> IVF grid per SURVEY §2 I1 knob mapping:
    n_centroids ~ graph_degree (partitioning granularity), nprobe ~
    search_width (search-time breadth), k = topk. ``limit_values`` truncates
    each knob list (smoke runs); the grid driver's validity constraint
    (nprobe <= n_centroids) prunes combos exactly like the reference's
    graph_degree <= intermediate_graph_degree rule."""
    from ..operators.gridsearch import GridConfig

    cp = config["cagra_params"]
    return GridConfig(
        n_centroids=_take(sorted({int(x) for x in cp["graph_degree"]}), limit_values),
        nprobe=_take(sorted({int(x) for x in cp["search_width"]}), limit_values),
        k=int(cp.get("topk", [10])[0]),
    )


def lsh_grid_from_config(config: dict, limit_values: int | None = None):
    """hnsw_params -> LSH grid per SURVEY §2 I2 knob mapping. HNSW knobs have
    no literal LSH equivalent, so each is compressed onto its analog's scale,
    monotonically (bigger HNSW effort -> bigger LSH effort):
    n_bits = log2(M) (bucket granularity), n_tables = efConstruction/64
    clamped to [1, 16] (build-side redundancy), multiprobe = log2(efSearch)-3
    clamped to [0, max n_bits] (search-side widening)."""
    from ..operators.gridsearch import LSHGridConfig

    hp = config["hnsw_params"]
    n_bits = _take(sorted({max(1, int(m).bit_length() - 1) for m in hp["M"]}), limit_values)
    n_tables = _take(
        sorted({min(16, max(1, int(ef) // 64)) for ef in hp["efConstruction"]}), limit_values
    )
    max_bits = max(n_bits)
    multiprobe = _take(
        sorted({min(max_bits, max(0, int(es).bit_length() - 4)) for es in hp["efSearch"]}),
        limit_values,
    )
    return LSHGridConfig(
        n_bits=n_bits,
        n_tables=n_tables,
        multiprobe=multiprobe,
        k=int(hp.get("topk", [10])[0]),
    )


def ivfpq_grid_from_config(config: dict, limit_values: int | None = None):
    """cagra_params -> composed IVF+PQ grid: the coarse knobs reuse the IVF
    mapping (n_centroids ~ max graph_degree, nprobe ~ search_width); the
    rerank axis comes from itopk_size (the reference's internal-candidate-
    list knob — exactly the role the ADC shortlist plays), clamped to
    >= topk."""
    from ..operators.gridsearch import IVFPQGridConfig

    cp = config["cagra_params"]
    k = int(cp.get("topk", [10])[0])
    rerank = _take(
        sorted({max(k, int(x)) for x in cp.get("itopk_size", [2 * k])}), limit_values
    )
    return IVFPQGridConfig(
        nprobe=_take(sorted({int(x) for x in cp["search_width"]}), limit_values),
        rerank=rerank,
        n_centroids=max(int(x) for x in cp["graph_degree"]),
        k=k,
    )
