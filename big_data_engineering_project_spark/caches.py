"""Owned-cache reclamation facade.

Several operators persist small internal frames they cannot unpersist
themselves (the returned DataFrame is lazy and still references them):
dedup shingle indexes and CC labels, association tagged counts, graph
iteration frames, the two-phase global-rank range shuffles, pareto
prefix-max frames. Each module tracks its own `_OWNED_PERSISTS` with a
`clear_*_caches()` reclaim hook; this facade calls all of them so
long-lived sessions (the driver's 190+-query sweep is one process) can
reclaim executor memory between queries. Always safe: subsequent
queries recompute; results are unaffected.
"""

from __future__ import annotations


def clear_all_owned_caches() -> None:
    from big_data_engineering_project_spark.operators.association import (
        clear_association_caches,
    )
    from big_data_engineering_project_spark.operators.dedup import (
        clear_dedup_caches,
    )
    from big_data_engineering_project_spark.operators.features import (
        clear_features_caches,
    )
    from big_data_engineering_project_spark.operators.frontier import (
        clear_frontier_caches,
    )
    from big_data_engineering_project_spark.operators.graph import (
        clear_graph_caches,
    )
    from big_data_engineering_project_spark.operators.linkage import (
        clear_linkage_caches,
    )
    from big_data_engineering_project_spark.operators.similarity import (
        clear_similarity_caches,
    )
    from big_data_engineering_project_spark.operators.sketches import (
        clear_sketches_caches,
    )

    for fn in (
        clear_dedup_caches,
        clear_association_caches,
        clear_graph_caches,
        clear_linkage_caches,
        clear_frontier_caches,
        clear_features_caches,
        clear_sketches_caches,
        clear_similarity_caches,
    ):
        try:
            fn()
        except Exception:
            pass
