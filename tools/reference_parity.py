#!/usr/bin/env python3
"""Reference-parity check: run the ACTUAL reference implementation
(/root/reference, pure pandas+numpy) on the same nation⋈region fixture
the frozen goldens were generated from, with a predict_fn equivalent to
graft.matcher.TokenCosineModel, and compare its explanation output
exactly against the Spark engine's (dumped by graft.tools.ParityDump).

Why two layers instead of one end-to-end run at the frozen setting
(num_triangles=10): the reference's support search shuffles with
UNSEEDED pandas sample(frac=1) (local_explain.py:186) and truncates
head+tail of that random order when support > num_triangles
(local_explain.py:64) — at num_triangles=10 the reference returns a
DIFFERENT random 10-subset of the 26 qualifying support pairs on every
run, so no fixed constants can match it. And a truncation-free full run
is inexpressible in the reference on this fixture: it needs
num_triangles >= 26, but find_candidates_predict's batching
(local_explain.py:111, splits = min(20, len/batch) with
batch = 2*num_triangles) yields ZERO batches when batch > |source| = 25,
degenerating to an empty explanation.

So the check decomposes on the one seam the randomness lives at:

  Layer A — support search as a SET: the pre-truncation neighborhood
  (get_support, local_explain.py:162-197) is deterministic as a set
  (the shuffle only permutes it). Run it at num_triangles=12 (the
  largest batchable setting) and assert the reference's qualifying
  pair-id set equals the Spark engine's support set (recovered from its
  triangle vertices at numTriangles=26, where Spark keeps everything).

  Layer B — explanation semantics on the FULL support: feed all 26
  qualifying pairs + the probe pair to the reference's explain_samples
  (triangles_method.py:204) directly — exactly what support_predictions
  would emit with no truncation — and require bit-for-bit equality of
  saliency, pss, and triangles against the Spark run at numTriangles=26
  (graft.tools.ParityDump), where no truncation / balancing /
  augmentation path executes in either engine.

Also asserts the frozen golden's 10 triangles (GoldenExplainer.scala,
numTriangles=10) are a subset of the full 26-triangle set.

Usage:
  sbt "runMain graft.tools.ParityDump 26 /tmp/parity_dump"
  python3 tools/reference_parity.py /tmp/parity_dump

Dev tool only (pandas/pyarrow are driver-side); the engine stays JVM-pure.
"""
import glob
import json
import sys
import types

# /root/reference imports tqdm, which is not in this container; the
# reference only uses it as a progress wrapper, so shim it.
_tqdm = types.ModuleType('tqdm')


class _Tqdm:
    def __init__(self, it=None, **kw):
        self._it = it

    def __iter__(self):
        return iter(self._it if self._it is not None else [])


_tqdm.tqdm = _Tqdm
sys.modules['tqdm'] = _tqdm
sys.path.insert(0, '/root/reference')

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

# the reference targets pandas<2 (DataFrame.append was removed in 2.0);
# restore it as the private _append, which kept identical semantics
if not hasattr(pd.DataFrame, 'append'):
    pd.DataFrame.append = pd.DataFrame._append

from certa import local_explain, triangles_method  # noqa: E402
from certa.local_explain import cs  # noqa: E402
from certa.utils import get_row  # noqa: E402

SF_DIR = '/root/testdata/sf0.001'
FULL_NT = 26  # 13 qualifying support records per side on this fixture


def fixture():
    """The golden fixture (ErQueries.goldenSource): nation ⋈ region with
    id/name/region/grp, identical to the Spark side."""
    nation = pd.read_parquet(f'{SF_DIR}/nation.parquet')
    region = pd.read_parquet(f'{SF_DIR}/region.parquet')
    src = nation.merge(region, left_on='n_regionkey', right_on='r_regionkey')
    df = pd.DataFrame({
        'id': src.n_nationkey.astype('int64'),
        'name': src.n_name.astype(str),
        'region': src.r_name.astype(str),
        'grp': 'group ' + (src.n_nationkey % 2).astype(str),
    }).sort_values('id').reset_index(drop=True)
    return df


def predict_fn(pairs: pd.DataFrame) -> pd.DataFrame:
    """TokenCosineModel equivalent: token-bag cosine (the reference's own
    `cs`) of the concatenated non-id attributes of each side. Ids are
    excluded, matching the engine (and the reference's documented intent
    — its ignored_columns check at local_explain.py:140-141 is inert)."""
    out = pairs.copy().reset_index(drop=True)
    lcols = [c for c in out.columns
             if c.startswith('ltable_') and c != 'ltable_id']
    rcols = [c for c in out.columns
             if c.startswith('rtable_') and c != 'rtable_id']

    def text(row, cols):
        return ' '.join(
            '' if pd.isna(row[c]) else str(row[c]) for c in cols)

    ms = [cs(text(row, lcols), text(row, rcols))
          for _, row in out.iterrows()]
    out['match_score'] = ms
    out['nomatch_score'] = [1.0 - m for m in ms]
    return out


def read_spark_dump(dump_dir, name):
    rows = []
    for p in sorted(glob.glob(f'{dump_dir}/{name}/part-*.json')):
        with open(p) as f:
            rows.extend(json.loads(line) for line in f if line.strip())
    return rows


def layer_a_support_set(df):
    """Reference get_support at the largest batchable num_triangles —
    the qualifying neighborhood as a set of composite pair ids."""
    probe = df.iloc[0]
    _, neighborhood = local_explain.get_support(
        class_to_explain=1, lsource=df.copy(), max_predict=-1,
        original_prediction=np.array([0.0, 1.0]), predict_fn=predict_fn,
        r1=probe, r2=probe, rsource=df.copy(), use_w=True, use_q=True,
        lprefix='ltable_', rprefix='rtable_', num_triangles=12)
    return set(neighborhood['id'].astype(str))


def layer_b_full_explain(df):
    """Reference explain_samples over ALL 26 qualifying pairs + probe —
    the no-truncation support_predictions output, assembled exactly as
    local_explain.support_predictions would (label = round(match_score),
    probe row first with label = pc)."""
    probe = df.iloc[0]
    rows = []
    probe_pair = get_row(probe, probe)
    probe_pair['id'] = '0@0#1@0'
    probe_pair['label'] = 1
    rows.append(probe_pair)
    # candidates4r1: probe as left vs every source record as right;
    # candidates4r2: the dual — keep the qualifying (<0.5) of each
    for lj in (True, False):
        for i in range(len(df)):
            cand = df.iloc[i]
            pair = get_row(probe, cand) if lj else get_row(cand, probe)
            scored = predict_fn(pair)
            if scored['match_score'].iloc[0] < 0.5:
                pair = pair.copy()
                pair['id'] = ('0@' + str(pair['ltable_id'].iloc[0]) +
                              '#1@' + str(pair['rtable_id'].iloc[0]))
                pair['label'] = 0
                rows.append(pair)
    support_pairs = pd.concat(rows, ignore_index=True)
    sources = [df.copy(), df.copy()]
    saliency, pss, cf_ex, triangles = triangles_method.explain_samples(
        support_pairs, sources, predict_fn, 'ltable_', 'rtable_',
        class_to_explain=1, attr_length=3)
    return support_pairs, saliency, pss, triangles


def main():
    dump_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/parity_dump'
    df = fixture()

    got_tri = sorted((r['u'], r['v'], r['w'])
                     for r in read_spark_dump(dump_dir, 'triangles'))
    got_sal = {r['attribute']: r['saliency']
               for r in read_spark_dump(dump_dir, 'saliency')}
    got_pss = {r['attrSet']: r['pos'] for r in read_spark_dump(dump_dir, 'pss')}

    failures = []

    # --- Layer A: support sets match
    ref_support = layer_a_support_set(df)
    # each spark triangle encodes one support pair: (0@0,1@0,0@x) is the
    # pair 0@x#1@0 from candidates4r2; (1@0,0@0,1@y) is 0@0#1@y
    spark_support = set()
    for (u, v, w) in got_tri:
        if u == '0@0':
            spark_support.add(w + '#' + v)
        else:
            spark_support.add(v + '#' + w)
    if ref_support != spark_support:
        failures.append(
            'Layer A support sets differ:\n'
            f'  only-ref  ={sorted(ref_support - spark_support)}\n'
            f'  only-spark={sorted(spark_support - ref_support)}')
    else:
        print(f'Layer A OK: reference pre-truncation support set == spark '
              f'support set ({len(ref_support)} pairs)')

    # --- Layer B: full-support explanation matches bit-for-bit
    support_pairs, ref_sal_d, ref_pss_s, ref_tri_l = layer_b_full_explain(df)
    assert len(support_pairs) == FULL_NT + 1, len(support_pairs)
    ref_tri = sorted((str(u), str(v), str(w)) for (u, v, w) in ref_tri_l)
    ref_sal = {k: float(v) for k, v in ref_sal_d.items()}
    ref_pss = {k: float(v) for k, v in ref_pss_s.items()}

    if got_tri != ref_tri:
        failures.append(
            f'Layer B triangles differ:\n  spark={got_tri}\n  ref  ={ref_tri}')
    # saliency: the reference accumulates `saliency[a] += v / flips` once
    # per (depth, attrSet) term (triangles_method.py:231-234); the engine
    # computes the mathematically identical base + (Σv) / flips as one
    # fused division (CertaExplainer.scala stage 6b). Same rational
    # value, different float association — allow exactly one ULP.
    import math
    for k in sorted(set(ref_sal) | set(got_sal)):
        a, b = got_sal.get(k), ref_sal.get(k)
        if a is None or b is None:
            failures.append(f'Layer B saliency[{k}]: spark={a} ref={b}')
        elif a != b:
            if abs(a - b) <= math.ulp(max(abs(a), abs(b))):
                print(f'Layer B saliency[{k}]: spark={a!r} ref={b!r} — '
                      f'1-ULP association difference (iterated += v/flips '
                      f'vs fused Σv/flips), accepted')
            else:
                failures.append(f'Layer B saliency[{k}]: spark={a} ref={b}')
    for k in sorted(set(ref_pss) | set(got_pss)):
        a, b = got_pss.get(k), ref_pss.get(k)
        if a is None or b is None or a != b:
            failures.append(f'Layer B pss[{k}]: spark={a} ref={b}')

    # --- cf_summary (the minimal max-probability antichain,
    # triangles_method.py:254-263) derived from the same pss
    from certa.triangles_method import cf_summary
    ref_cfs = {k: float(v) for k, v in cf_summary(ref_pss_s).items()}
    got_cfs = {r['attrSet']: r['pos']
               for r in read_spark_dump(dump_dir, 'cf_summary')}
    if ref_cfs != got_cfs:
        failures.append(
            f'Layer B cf_summary differs:\n  spark={sorted(got_cfs.items())}'
            f'\n  ref  ={sorted(ref_cfs.items())}')

    # --- frozen golden triangles are a subset of the full set
    frozen = [
        ('0@0', '1@0', '0@13'), ('0@0', '1@0', '0@14'),
        ('0@0', '1@0', '0@19'), ('0@0', '1@0', '0@23'),
        ('0@0', '1@0', '0@7'), ('0@0', '1@0', '0@9'),
        ('1@0', '0@0', '1@14'), ('1@0', '0@0', '1@17'),
        ('1@0', '0@0', '1@23'), ('1@0', '0@0', '1@24')]
    missing = [t for t in frozen if t not in ref_tri]
    if missing:
        failures.append(
            f'frozen golden triangles missing from reference full set: '
            f'{missing}')

    if failures:
        print('== PARITY FAIL')
        for f in failures:
            print(f)
        sys.exit(1)
    print(f'Layer B OK: saliency ({len(ref_sal)} attrs), pss '
          f'({len(ref_pss)} sets), triangles ({len(ref_tri)}) identical '
          f'between reference pandas and Spark engine')
    print('Frozen-golden subset OK: all 10 numTriangles=10 golden '
          'triangles appear in the full 26-triangle set')
    print('== PARITY OK')


if __name__ == '__main__':
    main()
