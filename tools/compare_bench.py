#!/usr/bin/env python3
"""Grade a BENCH_r{N}.json against the committed DuckDB baseline
(tools/baseline_duckdb.json), and optionally against a previous
round's Spark medians.

Usage:
  python3 tools/compare_bench.py BENCH_r03.json [BENCH_r02.json]

Always prints the per-query table from BASELINE.md with the new
numbers. Failed queries (Bench's -1.0 sentinel) are flagged and fail
the run. When a previous BENCH json is passed, class-A queries >1.5x
above the previous median (and >0.5 s) are flagged as regressions and
fail the run; without it only the failure check applies.
"""
import json, os, re, sys

CLASSES = {
    'A': ['q1_agg', 'q_join_agg', 'q_topk', 'q_window', 'q_antijoin', 'events_window',
          'q_sessionize', 'q_json', 'q_rollup', 'q_cube', 'q_having', 'q_phasefold', 'q_correlated',
          'q3_shipping', 'q5_local', 'q_percentile', 'q_pivot', 'gc_dist', 'gnomonic', 'cone_search', 'box_search',
          'polygon_search', 'hpix_histogram', 'hpix_index', 'partition_map', 'dedup_exact',
          'dedup_keyed', 'text_tokens', 'multimodal_meta', 'multimodal_frames', 'xmatch_knn', 'xmatch_postfilter',
          'text_tfidf', 'sample_split', 'sample_stratified', 'text_redact',
          'sample_quota', 'q_setops', 'q_hll', 'q_bloom', 'text_inverted',
          'text_chunk', 'sample_tokenbudget', 'q_cms', 'q_qsketch',
          'dedup_paragraph', 'q_zorder', 'text_collocations', 'q_funnel', 'q_retention',
          'multimodal_audio', 'text_perplexity', 'pipeline_c4', 'sample_dsir',
          'dedup_substring', 'sample_mixture', 'multimodal_video',
          'q_kmv', 'q_kmv_jaccard', 'q_anomaly', 'sample_leakage_safe',
          'q_heavyhitters', 'q_gsets', 'q_validate', 'q_profile', 'q10_returns',
          'q_merge', 'q_winsorize', 'text_entropy', 'q_bucketed', 'q_exact_quantiles', 'q19_brackets',
          'sample_curriculum', 'text_nb',
          'q2_mincost', 'q7_volume', 'q8_share', 'q14_promo', 'q16_partsupp',
          'q18_large', 'q22_idle', 'q_seqmatch', 'text_normalize', 'q_bitmap',
          'q_acf', 'q_abtest', 'q_bandjoin', 'q_ewma', 'q_scd2', 'q_diff',
          'q21_waiting', 'q_cooccur', 'q_hopping', 'q_overlapjoin',
          'q_resample', 'q_transitions', 'q_trend', 'text_hashfeat', 'q_argmax', 'q_joinest',
          'q_rfm', 'q_changepoint', 'q_nearjoin', 'sample_negatives', 'q_unpivot',
          'q_twap', 'q_gini', 'q_stickiness',
          'q4_priority', 'q6_forecast', 'q13_custdist', 'q15_topsupplier', 'q17_smallqty',
          'q9_profit', 'q11_topstock', 'q12_shipmode', 'q20_potential', 'text_bm25', 'text_nb_eval',
          'q_mode', 'q_benford', 'q_rolling', 'q_groupconcat', 'q_paircorr', 'q_streaks', 'q_shards', 'q_attribution', 'q_trainorder',
          'q_periodogram', 'q_structfunc', 'q_yoy', 'xmatch_pm', 'q_lcfeatures', 'text_ensemble',
          'q_topn_other', 'q_cdc', 'text_trigram', 'text_hybrid', 'hpix_smooth',
          'hpix_transients', 'xmatch_eval', 'hpix_maxima', 'pipeline_alert',
          'sample_weighted_k', 'dedup_substring_exact', 'q_kanon', 'q_funnel_latency',
          'text_drift', 'q_scd2_lookup', 'q_galactic', 'text_ccnet', 'xmatch_mutual', 'q_theilsen', 'text_centroid', 'text_auc', 'text_cv', 'q_attribution_multi', 'q_qnorm', 'text_calibration', 'q_cuped', 'q_mannwhitney', 'q_forecast_eval', 'q_coverage', 'q_xmatch_map', 'q_pareto80', 'q_ldiversity', 'text_kneserney', 'q_moc',
          'q_moc_ops', 'q_tcloseness', 'sample_dsir_kn', 'hpix_ring', 'q_moc_region'],
    'B': ['dedup_minhash', 'dedup_neardup', 'dedup_simhash', 'dedup_cluster', 'dedup_calibration',
          'q_asof', 'q_rangejoin', 'text_repetition', 'text_editdist', 'pack_greedy',
          'dedup_incremental_near', 'dedup_snm', 'q_skewjoin',
          'graph_triangles', 'graph_bfs', 'graph_pagerank', 'graph_sssp', 'dedup_ppjoin', 'q_skyline',
          'pipeline_er', 'dedup_keepbest', 'q_fof', 'q_fof_dist', 'q_twopoint', 'q_hierarchy',
          'pipeline_xmatch3', 'graph_communities', 'graph_modularity', 'graph_louvain',
          'pipeline_release'],
    'C': ['dedup_jaccard', 'dedup_cosine', 'ann_bruteforce', 'ann_lsh', 'ann_ivf', 'ann_recall',
          'ann_quantized', 'dedup_semantic', 'vec_centroids', 'text_langid', 'text_quality',
          'text_fingerprint', 'decontaminate', 'vec_kmeans', 'sample_weighted', 'dedup_incremental',
          'multimodal_decode', 'text_bpe', 'ann_pq', 'ann_ivfpq', 'sample_hardneg', 'ann_mmr', 'text_winnow', 'text_cdc', 'dedup_winnow', 'dedup_containment',
          'text_jaro', 'multimodal_phash', 'multimodal_afp', 'multimodal_keyframes', 'multimodal_phash_inc',
          'vec_dimstats', 'sample_hardneg_ivf'],
}
CLS = {q: k for k, qs in CLASSES.items() for q in qs}


def load_bench(path, merge=True):
    """merge=False for the PREVIOUS round's artifact: BENCH_FULL.json
    belongs to the current sweep only — merging it into the previous
    round's line produced r13's contradictory 'merged N entries' +
    'stale file, not merging' notes in one run (each note was about a
    different argv file consulting the same BENCH_FULL)."""
    text = open(path).read().strip()
    # Three accepted shapes: the raw one-line JSON Bench prints, that line
    # with an sbt "[info] " prefix, or the driver's wrapper object whose
    # "parsed" field (or failing that, "tail" text) carries the bench line.
    try:
        obj = json.loads(re.sub(r'^\[info\] ', '', text))
    except json.JSONDecodeError:
        obj = None
    bench = None
    if isinstance(obj, dict) and 'queries' in obj:
        bench = obj
    elif isinstance(obj, dict):
        if isinstance(obj.get('parsed'), dict) and 'queries' in obj['parsed']:
            bench = obj['parsed']
        else:
            m = re.search(r'\{"metric":.*?"queries":\{.*?\}.*?\}', obj.get('tail', ''))
            if m:
                bench = json.loads(m.group(0))
    if bench is None:
        raise SystemExit(f'{path}: no bench JSON line found')
    return merge_full(bench) if merge else bench


def merge_full(bench):
    """The stdout bench line is tail-capture-capped (~1800 chars) and drops
    its FASTEST per-query entries once the surface outgrows it (r9 lost 78
    of 171). Bench also writes the complete full-precision map to
    BENCH_FULL.json in the repo root; merge it back in, but only when the
    per-query overlap agrees with the captured line (same run, not a stale
    file — line entries are rounded to as little as 1 dp, so the tolerance
    is the 0.05 rounding half-width plus slack)."""
    full_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             'BENCH_FULL.json')
    if not os.path.exists(full_path):
        return bench
    try:
        full = json.load(open(full_path))
    except json.JSONDecodeError:
        return bench
    fq = full.get('queries', {})
    missing = [q for q in fq if q not in bench['queries']]
    if not missing:
        return bench
    if full.get('sf') != bench.get('sf'):
        print(f'NOTE: BENCH_FULL.json is for sf {full.get("sf")!r}, line is '
              f'{bench.get("sf")!r} — not merging', file=sys.stderr)
        return bench
    overlap = [q for q in fq if q in bench['queries']]
    stale = [q for q in overlap
             if abs(fq[q] - bench['queries'][q]) > 0.051 + 0.05 * abs(fq[q])]
    if stale:
        print(f'NOTE: BENCH_FULL.json disagrees with the captured line on '
              f'{stale[:5]}... — stale file, not merging', file=sys.stderr)
        return bench
    bench = dict(bench)
    bench['queries'] = dict(bench['queries'], **{q: fq[q] for q in missing})
    bench.pop('dropped', None)
    print(f'NOTE: merged {len(missing)} line-dropped entries from BENCH_FULL.json',
          file=sys.stderr)
    return bench


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    base = json.load(open(os.path.join(here, 'baseline_duckdb.json')))['duckdb_sec']
    bench = load_bench(sys.argv[1])['queries']
    prev = load_bench(sys.argv[2], merge=False)['queries'] if len(sys.argv) > 2 else None
    # per-query job-floor medians (same queries at sf0.001 — constant
    # scheduling cost, ~zero data cost); when present, the class-A
    # criterion additionally grades the DATA-DEPENDENT component
    # max(spark - floor, 0) so a 20x ratio on a 30 ms DuckDB query
    # whose Spark cost is all job floor stops reading as a throughput
    # deficit (it vanishes at scale)
    floor_path = os.path.join(here, 'floor_sf0.001.json')
    floor = {}
    if os.path.exists(floor_path):
        floor = json.load(open(floor_path)).get('queries', {})
    # fixture-first grading (r15 verdict item 6): when the multi-row-
    # group fixture sweep is present, the class-A 2x criterion grades
    # fxdata/duckdb = max(fixture - floor, 0) / duckdb — the 100 TB-
    # shaped layout — and the stock data ratio stays for comparison
    fixture_path = os.path.join(here, 'bench_fixture_sf0.1.json')
    fixture = {}
    if os.path.exists(fixture_path):
        fixture = json.load(open(fixture_path)).get('queries', {})

    print('| query | class | spark s | duckdb s | spark/duckdb |' + (' vs prev |' if prev else ''))
    regressions, failed = [], []
    for name in sorted(bench):
        s = bench[name]
        cls = CLS.get(name, '?')
        if s < 0:  # Bench's failure sentinel — never a valid timing
            failed.append(name)
            print(f'| {name} | {cls} | FAILED |  |  |' + ('  |' if prev else ''))
            continue
        d = base.get(name)
        row = f'| {name} | {cls} | {s:.3f} | ' + (f'{d:.3f} | {s/d:.2f} |' if d else ' n/a |  |')
        if prev:
            if prev.get(name, -1) > 0:
                row += f' {s/prev[name]:.2f}x |'
                if cls == 'A' and s > 1.5 * prev[name] and s > 0.5:
                    regressions.append(name)
            else:
                row += ' n/a |'  # absent or failed in prev — keep the table rectangular
        print(row)
    for k in 'ABC':
        qs = [q for q in CLASSES[k] if q in bench and bench[q] >= 0]
        ss = sum(bench[q] for q in qs)
        ds = sum(base[q] for q in qs if q in base)
        ratio = f'{ss/ds:.2f}' if ds else 'n/a'
        print(f'| **total {k}** |  | **{ss:.2f}** | **{ds:.2f}** | **{ratio}** |')
        if k == 'A' and floor:
            # same convention as gen_baseline_md.py: a class-A query
            # missing from the floor file counts its FULL spark time
            # as data (and is warned about) instead of silently
            # dropping from the numerator while staying in the
            # denominator (r13 ADVICE)
            nofloor = [q for q in qs if floor.get(q, -1) < 0]
            if nofloor:
                print(f'WARNING: class-A queries missing from floor_sf0.001.json '
                      f'(full spark time counted as data): {nofloor}', file=sys.stderr)
            data = sum(max(bench[q] - floor[q], 0.0) if floor.get(q, -1) >= 0
                       else bench[q] for q in qs)
            dr = f'{data/ds:.2f}' if ds else 'n/a'
            print(f'| **total A data-dep (minus sf0.001 job floor)** |  | '
                  f'**{data:.2f}** | **{ds:.2f}** | **{dr}** |')
        if k == 'A' and floor and fixture:
            fqs = [q for q in qs if fixture.get(q, -1) >= 0]
            fds = sum(base[q] for q in fqs if q in base)
            fdata = sum(max(fixture[q] - floor[q], 0.0) if floor.get(q, -1) >= 0
                        else fixture[q] for q in fqs)
            fr = f'{fdata/fds:.2f}' if fds else 'n/a'
            cov = '' if len(fqs) == len(qs) else f' ({len(fqs)}/{len(qs)} swept)'
            print(f'| **total A fixture-data (multi-row-group layout{cov})** |  | '
                  f'**{fdata:.2f}** | **{fds:.2f}** | **{fr}** |')
            weak = [(max(fixture[q] - floor[q], 0.0) / base[q], q)
                    for q in fqs if q in base and floor.get(q, -1) >= 0
                    and base[q] > 0
                    and max(fixture[q] - floor[q], 0.0) > 2 * base[q]
                    and max(fixture[q] - floor[q], 0.0) > 0.1]
            if weak:
                print('WEAK (class A, fixture-data > 2x DuckDB and > 0.1 s): '
                      + ', '.join(f'{q} {r:.1f}x' for r, q in sorted(weak, reverse=True)))
    if failed:
        print(f'\nFAILED QUERIES (bench sentinel -1.0): {failed}')
    if regressions:
        print(f'\nREGRESSIONS (class A, >1.5x vs prev, >0.5 s): {regressions}')
    if failed or regressions:
        sys.exit(1)


if __name__ == '__main__':
    main()
