#!/usr/bin/env python
"""One-shot mechanical splitter for plans/catalog_ext.py (r9 VERDICT
task #6: 17k lines → thematic modules, unchanged public surface).

Segments the file into top-level chunks (defs, assigns, imports,
EXTRA_QUERIES.update calls), themes each update call by its first query
name, propagates themes to the defs/assigns they reference (nearest-
preceding definition for duplicate names — matches Python's import-time
binding), promotes anything referenced from 2+ themes (or from a shared
chunk) into ext/_shared.py, and emits:

    yelp_etl_spark/plans/ext/_shared.py     shared helpers + the
                                            collected-registry dict
    yelp_etl_spark/plans/ext/ext_<theme>.py chunks in original order
    yelp_etl_spark/plans/catalog_ext.py     thin shim: imports the theme
                                            modules, reorders the
                                            registry into the legacy
                                            EXTRA_QUERIES order

Chunk SOURCES are copied verbatim — no rewriting beyond module headers.
Validation (surface equality vs the original) is done by the caller;
this script only emits files under a staging dir for review.
"""

from __future__ import annotations

import ast
import os
import sys
from collections import defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "yelp_etl_spark", "plans", "catalog_ext.py")
PKG = os.path.join(ROOT, "yelp_etl_spark", "plans", "ext")

THEME_ORDER = [
    "text", "ml", "stats", "graph", "stream", "lakehouse",
    "containers", "misc",
]

# explicit name → theme map, keyword fallbacks below
OVERRIDES = {
    # containers / multimodal
    "pcm_stats": "containers", "frame_sample_manifest": "containers",
    "wav_riff_parse": "containers", "tiff_ifd_parse": "containers",
    "png_ihdr_parse": "containers", "jpeg_sof_parse": "containers",
    "gif_block_parse": "containers", "zip_central_dir_parse": "containers",
    "udtf_chunk_stats": "containers",
    # lakehouse / io / pipeline
    "table_checksum": "lakehouse", "checksum_incremental": "lakehouse",
    "gold_pipeline_rollup": "lakehouse", "medallion_gold_parity": "lakehouse",
    "orc_scan_roundtrip": "lakehouse", "text_scan_roundtrip": "lakehouse",
    "binaryfile_scan_roundtrip": "lakehouse", "golden_record": "lakehouse",
    "gdpr_erasure_audit": "lakehouse", "bitemporal_as_of": "lakehouse",
    "profile_columns": "lakehouse", "incremental_join_view": "stream",
    "cdc_apply": "stream", "cdc_apply_out_of_order": "stream",
    # graph
    "sssp_weighted": "graph", "personalized_pagerank": "graph",
    "label_prop_communities": "graph", "kcore_degrees": "graph",
    "kcore_peeling": "graph", "temporal_reachability": "graph",
    "clustering_coefficient": "graph", "degree_assortativity": "graph",
    "random_walks": "graph", "adamic_adar_linkpred": "graph",
    "harmonic_centrality": "graph", "boruvka_mst": "graph",
    "ktruss_support": "graph", "markov_transitions": "graph",
    "markov_attribution": "graph", "recursive_hierarchy": "graph",
    # text / NLP / dedup / search
    "event_path_pattern": "text", "novelty_scores": "text",
    "containment_pairs": "text", "winnow_fingerprints": "text",
    "dedup_aware_split": "text", "pmi_collocations": "text",
    "chi2_terms": "text", "bigram_nll": "text", "mi_terms": "text",
    "phrase_search_positional": "text", "trigram_search": "text",
    "zipf_slope": "text", "rake_keyphrases": "text",
    "readability_scores": "text", "gazetteer_entity_match": "text",
    "dsir_importance_weights": "text", "url_normalize_dedup": "text",
    "heaps_law_fit": "text", "kneser_ney_bigram_nll": "text",
    "dunning_g2_collocations": "text", "gopher_quality_rules": "text",
    "duplicate_spans": "text", "duplicate_spans_pruned": "text",
    "hybrid_search_rrf": "text",
    # ml / embeddings / eval / splits
    "kmeans_clusters": "ml", "jl_projection": "ml",
    "pca_top_component": "ml", "hashed_features": "ml",
    "naive_bayes_confusion": "ml", "auc_score": "ml",
    "logreg_weights": "ml", "ann_recall_at_k": "ml",
    "reliability_bins": "ml", "contrastive_pairs": "ml",
    "als_factors": "ml", "ndcg_mrr_eval": "ml", "gbt_stumps": "ml",
    "woe_encoding": "ml", "loo_target_encoding": "ml",
    "record_linkage_fs": "ml", "isotonic_calibration": "ml",
    "grouped_kfold_assign": "ml", "lift_gains_deciles": "ml",
    "shapley_attribution": "ml", "conformal_interval_coverage": "ml",
    "temporal_purged_split": "ml", "matryoshka_prefix_recall": "ml",
    "hamming_binary_topk": "ml", "dbscan_core_classification": "ml",
    "dpp_prune_join": "ml", "ari_cluster_agreement": "ml",
    "assoc_rules": "ml", "apriori_triples": "ml",
    "cogroup_attribution": "ml",
    # stats / timeseries / sketches
    "psi_drift": "stats", "kaplan_meier": "stats",
    "acf_daily_events": "stats", "benford_audit": "stats",
    "ab_test_ztest": "stats", "cusum_top_days": "stats",
    "mann_whitney_u": "stats", "ks_two_sample": "stats",
    "theil_sen_slope": "stats", "ols_normal_equations": "stats",
    "diff_in_diff": "stats", "holt_linear_trend": "stats",
    "seasonal_naive_backtest": "stats", "seasonal_decompose_dow": "stats",
    "seasonal_decompose": "stats", "nelson_aalen": "stats",
    "log_rank_test": "stats", "anova_f_test": "stats",
    "changepoint_binary_seg": "stats", "cohens_kappa": "stats",
    "cramers_v": "stats", "spearman_corr": "stats",
    "gini_concentration": "stats", "mann_kendall_trend": "stats",
    "trimmed_winsorized_mean": "stats", "weighted_median": "stats",
    "weighted_median_grouped": "stats", "kruskal_wallis_h": "stats",
    "kendall_tau_daily": "stats", "welch_ttest": "stats",
    "mode_per_group": "stats", "pacf_daily": "stats",
    "jarque_bera": "stats", "bollinger_anomaly_days": "stats",
    "durbin_watson_ols": "stats", "cronbach_alpha": "stats",
    "wasserstein1_drift": "stats", "fd_discovery": "stats",
    "misra_gries_heavy_hitters": "stats", "diversity_indices": "stats",
    "skew_report": "stats", "kaplan": "stats",
    "cms_join_size_estimate": "stats", "approx_quantile_checked": "stats",
    "hll_mergeable_checked": "stats", "stream_hll_distinct": "stream",
}


def theme_of(name: str) -> str:
    if name in OVERRIDES:
        return OVERRIDES[name]
    if name.startswith(("bpe_",)):
        return "text"
    if name.startswith("stream_"):
        return "stream"
    if name.startswith("snapshot_") or "pipeline" in name:
        return "lakehouse"
    return "misc"


def target_names(node) -> list[str]:
    out = []
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        out.append(node.name)
    elif isinstance(node, ast.Assign):
        for t in node.targets:
            for n in ast.walk(t):
                if isinstance(n, ast.Name):
                    out.append(n.id)
    elif isinstance(node, ast.AnnAssign):
        if isinstance(node.target, ast.Name):
            out.append(node.target.id)
    elif isinstance(node, (ast.Import, ast.ImportFrom)):
        for a in node.names:
            out.append((a.asname or a.name).split(".")[0])
    return out


def main() -> None:
    src = open(SRC).read()
    if "Extension-catalog shim" in src:
        raise SystemExit(
            "catalog_ext.py is already the post-split shim — this "
            "one-shot splitter only applies to the pre-round-10 "
            "monolith (kept for provenance; re-running would clobber "
            "the ext/ package)."
        )
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    chunks = []  # dicts: node, src, kind, defines, refs, lineno
    prev_end = 0
    for node in tree.body:
        start = prev_end  # 0-based index of first line of segment
        end = node.end_lineno  # 1-based inclusive
        seg = "".join(lines[start:end])
        prev_end = end
        kind = "other"
        qnames = []
        if (
            isinstance(node, ast.Expr)
            and isinstance(node.value, ast.Constant)
            and isinstance(node.value.value, str)
        ):
            kind = "docstring"
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            # header imports (before line 30) vs mid-file imports
            kind = "import" if node.lineno < 30 else "miditem"
        elif isinstance(node, ast.Expr) and isinstance(node.value, ast.Call):
            c = node.value
            if (
                isinstance(c.func, ast.Attribute)
                and c.func.attr == "update"
                and isinstance(c.func.value, ast.Name)
                and c.func.value.id == "EXTRA_QUERIES"
            ):
                kind = "update"
                d = c.args[0]
                if isinstance(d, ast.Call):  # dict(...) form — not used
                    raise SystemExit("unexpected update arg form")
                qnames = [k.value for k in d.keys]
        elif isinstance(node, ast.Assign) and target_names(node) == [
            "EXTRA_QUERIES"
        ]:
            kind = "registry_init"
            d = node.value
            if isinstance(d, ast.Dict) and d.keys:
                qnames = [k.value for k in d.keys]
        else:
            kind = "miditem"
        refs = {
            n.id
            for n in ast.walk(node)
            if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load)
        }
        chunks.append(
            dict(
                node=node, src=seg, kind=kind, qnames=qnames,
                defines=target_names(node), refs=refs,
                lineno=node.lineno,
            )
        )

    # name → list of (chunk_idx) defining it, in order
    def_sites: dict[str, list[int]] = defaultdict(list)
    for i, c in enumerate(chunks):
        if c["kind"] in ("miditem",):
            for n in c["defines"]:
                def_sites[n].append(i)

    def resolve(name: str, from_idx: int) -> int | None:
        sites = def_sites.get(name)
        if not sites:
            return None
        prior = [s for s in sites if s < from_idx]
        return prior[-1] if prior else sites[-1]

    # initial themes: update chunks by first key; registry_init queries
    theme: dict[int, str] = {}
    for i, c in enumerate(chunks):
        if c["kind"] == "update":
            theme[i] = theme_of(c["qnames"][0])

    # propagate to miditem chunks via referrers, to fixpoint
    changed = True
    while changed:
        changed = False
        # referrer themes per chunk
        ref_themes: dict[int, set[str]] = defaultdict(set)
        for i, c in enumerate(chunks):
            t = theme.get(i)
            if t is None:
                continue
            for name in c["refs"]:
                j = resolve(name, i)
                if j is not None and j != i:
                    ref_themes[j].add(t)
        for i, c in enumerate(chunks):
            if c["kind"] != "miditem":
                continue
            ts = ref_themes.get(i, set())
            new = None
            if "shared" in ts or len(ts) > 1:
                new = "shared"
            elif len(ts) == 1:
                new = next(iter(ts))
            if new is not None and theme.get(i) != new:
                # only ever widen theme → shared, never flip themes
                if theme.get(i) is None or new == "shared":
                    theme[i] = new
                    changed = True

    # registry_init queries (the very first EXTRA_QUERIES = {...}) keep
    # their defs in shared? No: re-theme the init dict's queries as an
    # update chunk in the FIRST theme module they map to — simpler:
    # convert the init chunk into a synthetic update chunk.
    init_idx = next(
        i for i, c in enumerate(chunks) if c["kind"] == "registry_init"
    )
    init_chunk = chunks[init_idx]
    if init_chunk["qnames"]:
        # rewrite "EXTRA_QUERIES = {...}" → "EXTRA_QUERIES.update({...})"
        s = init_chunk["src"]
        s = s.replace("EXTRA_QUERIES = {", "EXTRA_QUERIES.update({", 1)
        # close the update call: final "}" of the dict becomes "})"
        last = s.rstrip()
        # hard raise, not assert: invariants in executable scripts must
        # survive python -O (r14 ADVICE #4)
        if not last.endswith("}"):
            raise ValueError(
                "registry_init chunk does not end with '}': cannot "
                "rewrite EXTRA_QUERIES dict into an update() call"
            )
        s = last[:-1] + "})\n"
        init_chunk["src"] = s
        init_chunk["kind"] = "update"
        theme[init_idx] = theme_of(init_chunk["qnames"][0])
        # re-run one propagation round for its refs
        for name in init_chunk["refs"]:
            j = resolve(name, init_idx)
            if j is not None and theme.get(j) is None:
                theme[j] = theme[init_idx]

    # unassigned miditems → shared; then close shared over references
    for i, c in enumerate(chunks):
        if c["kind"] == "miditem" and i not in theme:
            theme[i] = "shared"
    changed = True
    while changed:
        changed = False
        for i, c in enumerate(chunks):
            if theme.get(i) != "shared":
                continue
            for name in c["refs"]:
                j = resolve(name, i)
                if j is not None and j != i and theme.get(j) not in (
                    None, "shared",
                ) and chunks[j]["kind"] == "miditem":
                    theme[j] = "shared"
                    changed = True

    header_imports = [c["src"] for c in chunks if c["kind"] == "import"]
    docstring = next(
        (c["src"] for c in chunks if c["kind"] == "docstring"), '""""""\n'
    )

    os.makedirs(PKG, exist_ok=True)

    shared_body = []
    theme_bodies: dict[str, list[str]] = {t: [] for t in THEME_ORDER}
    for i, c in enumerate(chunks):
        t = theme.get(i)
        if c["kind"] in ("docstring", "import", "registry_init"):
            continue
        if t == "shared":
            shared_body.append(c["src"])
        elif t in theme_bodies:
            theme_bodies[t].append(c["src"])
        else:
            raise SystemExit(f"unthemed chunk at line {c['lineno']}: {t}")

    # names each theme module must import from _shared
    shared_names = set()
    for i, c in enumerate(chunks):
        if theme.get(i) == "shared":
            shared_names.update(c["defines"])

    hdr = "".join(header_imports)

    with open(os.path.join(PKG, "__init__.py"), "w") as f:
        f.write(
            '"""Thematic extension-catalog modules (split from the '
            "monolithic\nplans/catalog_ext.py in round 10; the shim "
            'there preserves the public\nsurface and legacy ordering)."""\n'
        )

    with open(os.path.join(PKG, "_shared.py"), "w") as f:
        f.write(
            '"""Shared helpers + the collected extension-query registry.'
            "\n\nEvery ext_<theme> module registers into EXTRA_QUERIES "
            "here; the\nplans/catalog_ext shim reorders it into the "
            'legacy order."""\n\n'
        )
        f.write(hdr)
        f.write("\nEXTRA_QUERIES: dict = {}\n\n")
        f.write("".join(shared_body))

    for t in THEME_ORDER:
        body = theme_bodies[t]
        used = set()
        for srctext in body:
            mod = ast.parse(srctext)
            for n in ast.walk(mod):
                if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load):
                    used.add(n.id)
        imports = sorted((shared_names & used) | {"EXTRA_QUERIES"})
        imp = (
            "from yelp_etl_spark.plans.ext._shared import (  # noqa: F401\n"
            + "".join(f"    {n},\n" for n in imports)
            + ")\n"
        )
        with open(os.path.join(PKG, f"ext_{t}.py"), "w") as f:
            f.write(f'"""Extension catalog — {t} queries."""\n\n')
            f.write(hdr)
            f.write("\n" + imp + "\n")
            f.write("".join(body))

    order = []
    for c in chunks:
        order.extend(c["qnames"])
    with open(os.path.join(PKG, "_order.py"), "w") as f:
        f.write(
            '"""Legacy EXTRA_QUERIES insertion order (pre-split), so the\n'
            "catalog_ext shim reproduces the exact historical ordering;\n"
            'queries added post-split simply append after these."""\n\n'
            "LEGACY_ORDER: tuple[str, ...] = (\n"
            + "".join(f"    {n!r},\n" for n in order)
            + ")\n"
        )
    print(f"chunks: {len(chunks)}, shared: {len(shared_body)}, "
          + ", ".join(f"{t}: {len(theme_bodies[t])}" for t in THEME_ORDER))
    print(f"queries: {len(order)}")


if __name__ == "__main__":
    sys.exit(main())
