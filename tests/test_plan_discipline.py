"""Grep-enforceable plan discipline (VERDICT r1 'done' criterion for the
scale-killer sweep): no crossJoin against an unbounded side, and no
partitionless Window.orderBy over data-sized input, anywhere in the engine.

Every allowed occurrence is an explicit allowlist entry with the reason it
is bounded; adding a new crossJoin/global window fails this test until it
is justified here.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "whitebox_geospatial_analysis_tools_spark"

# EVERY crossJoin call site must be allowlisted with the reason its small
# side is BOUNDED (constant-size, 1-row aggregate, or a fixed layer) —
# wrapping a data-derived frame in F.broadcast() does NOT exempt it
# (VERDICT r2 wrong #2/#3: raster_buffer / voronoi_assign hid O(n^2)
# products behind broadcast of data-sized sides).
# (filename regex, line-content regex) -> why it is bounded
CROSSJOIN_ALLOW = [
    (r"queries_text\.py", r"c\.crossJoin\(F\.broadcast\(mx\)\)",
     "|langs|-row rate table x 1-row max aggregate (temperature_mix)"),
    (r"queries_text\.py", r"v\.crossJoin\(F\.broadcast\(tot\)\)",
     "vocabulary table x 1-row total aggregate (unigram_logprob)"),
    (r"operators/textops\.py", r"v\.crossJoin\(F\.broadcast\(best\)\)",
     "vocabulary table x 1-row merge-pair argmax (bpe_train)"),
    (r"queries_text\.py", r"toks\.crossJoin\(F\.broadcast\(m\)\)",
     "token stream x 1-row learned merge pair (bpe_encode, 3 chained)"),
    (r"queries_vector\.py", r"wsum\.crossJoin\(dsum\)",
     "two 1-row aggregate scalars (Moran's I normalization)"),
    (r"operators/overlay\.py", r"sa\.crossJoin\(ca\)\.crossJoin\(ia\)",
     "three 1-row aggregate scalars (union area inclusion-exclusion)"),
    (r"queries_raster\w*\.py", r"spark\.range\(120\)\.selectExpr.*crossJoin\(",
     "bounded range x range grid generator (resample target grid)"),
    (r"queries_raster\w*\.py", r"\.crossJoin\(spark\.range\(1, 118\)",
     "bounded range x range grid generator (bilinear target grid)"),
    (r"queries_raster\w*\.py", r"\.crossJoin\(spark\.range\(4, 230\)",
     "bounded range x range grid generator (cubic target grid)"),
    (r"queries_vector\.py", r"crossJoin\(F\.broadcast\(m\)\)",
     "1-row moment aggregate (Moran's I mu/n)"),
    (r"queries_vector\.py", r"pts\.crossJoin\(F\.broadcast\(seeds\)\)",
     "fixed-k seed table (kmeans_step, constant _SEEDS)"),
    (r"queries_vector\.py", r"pts\.crossJoin\(F\.broadcast\(cents\d?\)\)",
     "fixed-k centroid tables (iterated kmeans / ISODATA, k constant)"),
    (r"queries_vector\.py", r"pts\.crossJoin\(F\.broadcast\(surv\)\)",
     "surviving fixed-k centroids (modified_kmeans, <= 4 rows)"),
    (r"queries_raster\w*\.py", r"st\.crossJoin\(F\.broadcast\(gm\)\)",
     "1-row global-mean aggregate (local contrast enhancement)"),
    (r"operators/simsearch\.py", r"crossJoin\(F\.broadcast\(seeds\)\)",
     "fixed 16-row PQ seed table (PQ_SEED_IDS — codebook size is "
     "corpus-independent by PQ design)"),
    (r"queries_raster\w*\.py", r"pits\.crossJoin\(F\.broadcast\(offs\)\)",
     "constant 16-row ring-2 offset table (BreachPits)"),
    (r"operators/stats\.py", r"crossJoin\(F\.broadcast\((m|total|pe|bnd|comp)\)\)",
     "1-row aggregate scalars / <=buckets-row boundary tables"),
    (r"operators/vector\.py", r"crossJoin\(F\.broadcast\(e\)\)",
     "fixed polygon-layer edge table (the small dim side by design)"),
    (r"queries_raster\w*\.py", r"crossJoin\(F\.broadcast\((mm|total|t|m|vz)\)\)",
     "1-row min/max/total aggregates (stretch/equalize/CDF/viewpoint scalars)"),
    (r"queries_raster\w*\.py", r"crossJoin\(F\.broadcast\(lv\)\)",
     "fixed 3-row contour level list"),
    (r"queries_raster\w*\.py", r"dem\.crossJoin\(F\.broadcast\(vpz\)\)",
     "fixed 9-station viewpoint grid (visibility_index, constant _VI_VPS)"),
    (r"operators/distance\.py", r"crossJoin\(F\.broadcast\(bounds\)\)",
     "1-row target bounding-box aggregate (uncovered-block radius fallback)"),
    (r"queries_vector\.py", r"spark\.range\(_DG_N\)\.selectExpr.*crossJoin\(",
     "bounded range x range grid generator (dissolve parcel layer)"),
    (r"operators/vectorize\.py", r"\.crossJoin\(comp\.agg\(",
     "two 1-row aggregates (contour per-level stats)"),
    (r"queries_raster\w*\.py", r"\.crossJoin\(F\.broadcast\(zmin\)\)",
     "1-row global-minimum aggregate (downslope_index_radius skip test)"),
    (r"queries_raster\w*\.py", r"live\.crossJoin\(F\.broadcast\(offs\)\)",
     "fixed 168-row ring-offset table (downslope_index_radius window)"),
    (r"queries_vector\.py", r"\.crossJoin\(F\.broadcast\(nbr\)\)",
     "constant 9-row 3x3 bucket-offset table (find_polygon_chains prefilter)"),
    (r"queries_spatial\.py", r"bins\.crossJoin\(F\.broadcast\(cands\)\)",
     "fixed 8-row candidate-range table x <=16 lag bins (variogram fit)"),
    (r"queries_spatial\.py", r"fit\.crossJoin\(F\.broadcast\(tot\)\)",
     "1-row fit scalar x 1-row bin-total aggregate (kriging_fit)"),
    (r"queries_raster\w*\.py", r"\.crossJoin\(spark\.range\(_RP_TRC\)",
     "bounded range x range grid generator (reprojection target grid)"),
]

# Pure non-equi join conditions (`.join(x, F.col(a) != / < / > F.col(b))`)
# become BroadcastNestedLoopJoin — layer^2 work on data-sized frames
# (VERDICT r3 wrong #1: find_polygon_chains' endpoint pairing).  Every
# occurrence must be allowlisted with the reason a side is BOUNDED.
NONEQUI_ALLOW = [
    (r"queries_spatial\.py", r"\.join\([bc], F\.col\(\"s[23]\"\) > F\.col\(\"s[12]\"\)\)",
     "Delaunay candidate triples over the decimated fixed site layer "
     "(doc_id % _TIN_MOD — bounded site count by construction)"),
    (r"queries_raster\w*\.py", r"join\(F\.broadcast\(cb\.alias\(\"b\"\)\), F\.col\(\"b\.q\"\)",
     "histogram-bin CDF x CDF lookup table (bounded by bin count)"),
    (r"operators/simsearch\.py", r"c\.join\(F\.broadcast\(q\), F\.col\(\"q_id\"\)",
     "fixed broadcast query set (cosine_topk brute baseline by design)"),
    (r"operators/simsearch\.py", r"a\.join\(b, F\.col\(\"d1\"\) < F\.col\(\"d2\"\)\)",
     "documented brute-force exactness oracle for the LSH path"),
]

# partitionless Window.orderBy sites allowed: input is a BOUNDED table
WINDOW_ALLOW = [
    (r"operators/simsearch\.py", r'Window\.orderBy\("_h", "vec_id"\)',
     "seed ordinal over the limit(n_lists)-bounded hash-ordered sample "
     "(O(sqrt(n)) rows by construction)"),
    (r"operators/stats\.py", r'Window\.orderBy\("bin"\)',
     "histogram bin table (bounded by value-range / bin width)"),
    (r"operators/stats\.py", r'Window\.orderBy\("_bkt"\)',
     "percentile bucket counts (<= buckets rows)"),
    (r"queries_raster\w*\.py", r'Window\.orderBy\("bin"\)',
     "histogram bin table (equalization/matching CDFs)"),
    (r"queries_raster\w*\.py", r'Window\.orderBy\("step"\)',
     "quantile step table (bounded level count)"),
]


def _scan(pattern: str, allow):
    bad = []
    for p in PKG.rglob("*.py"):
        rel = str(p.relative_to(PKG.parent)).replace("\\", "/")
        for i, line in enumerate(p.read_text().splitlines(), 1):
            if re.search(pattern, line) and not line.lstrip().startswith("#"):
                if any(
                    re.search(fpat, rel) and re.search(lpat, line)
                    for fpat, lpat, _ in allow
                ):
                    continue
                bad.append(f"{rel}:{i}: {line.strip()}")
    return bad


def test_no_unbounded_crossjoin():
    bad = _scan(r"\.crossJoin\(", CROSSJOIN_ALLOW)
    assert not bad, "unallowlisted crossJoin sites:\n" + "\n".join(bad)


def test_no_partitionless_data_window():
    bad = _scan(r"Window\.orderBy\(", WINDOW_ALLOW)
    assert not bad, "unallowlisted global Window.orderBy sites:\n" + "\n".join(bad)


def test_no_unbounded_nonequi_join():
    bad = _scan(r"\.join\([^,]+, *F\.col\([^)]+\) *(!=|<=?|>=?) *F\.col\(",
                NONEQUI_ALLOW)
    assert not bad, "unallowlisted non-equi join sites:\n" + "\n".join(bad)
