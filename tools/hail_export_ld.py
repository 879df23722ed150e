#!/usr/bin/env python3
"""One-time Hail -> long-parquet LD export bridge.

The graft engine ingests LD as plain DataFrames -- the (i, j, r) entry
triangle plus the (contig, position, alleles, idx) variant index
(see src/main/scala/graft/sources/GnomadLd.scala). Users holding raw
Hail-format matrices (GnomAD `.bm`/`.ht`, Pan-UKBB `.bm`) run this
script ONCE wherever Hail is installed (public Hail API only; Hail is
deliberately not a dependency of the engine). The parquet outputs feed
GnomadLd.filterEntries / processVariantIndices unchanged.

Reference shapes: gentropy reads these matrices in-process via Hail
(src/gentropy/datasource/gnomad/ld.py:25-553); this bridge replaces
that coupling with a one-time export.

Scale notes (the GnomAD EUR matrix is ~14M x 14M):
  * --radius bands the matrix around the diagonal BEFORE entries()
    (BlockMatrix.sparsify_band): LD decays with distance, and the
    banded export is what the window/locus operators consume. Without
    banding, entries() of the full triangle is ~1e14 cells.
  * --min-r2 prefilters entries at export so the parquet holds only
    rows the engine would keep anyway (GnomadLd.filterEntries re-checks).
  * exports write directly via Hail's Spark backend -- shard count
    follows the cluster's default parallelism; no driver collection.

Usage:
  python3 hail_export_ld.py entries --bm .../matrix.bm \
      --out .../entries.parquet [--radius 10000000] [--min-r2 0.25]
  python3 hail_export_ld.py index --ht .../index.ht \
      --out .../index.parquet
"""
import argparse
import sys


def export_entries(bm_path: str, out: str, radius: int, min_r2: float) -> None:
    import hail as hl
    bm = hl.linalg.BlockMatrix.read(bm_path)
    if radius > 0:
        # keep a band of `radius` matrix indices around the diagonal;
        # blocks entirely outside the band are never touched
        bm = bm.sparsify_band(lower=-radius, upper=radius)
    et = bm.entries()  # Table<i, j, entry>, upper triangle for LD exports
    if min_r2 > 0:
        et = et.filter(et.entry ** 2 >= min_r2)
    et = et.rename({"entry": "r"})
    et.to_spark().write.mode("overwrite").parquet(out)


def export_index(ht_path: str, out: str) -> None:
    import hail as hl
    ht = hl.read_table(ht_path).add_index("idx")
    ht.select(
        contig=ht.locus.contig,
        position=ht.locus.position,
        alleles=ht.alleles,
        idx=ht.idx,
    ).to_spark().write.mode("overwrite").parquet(out)


def main(argv):
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)
    pe = sub.add_parser("entries", help="export the (i, j, r) entry triangle")
    pe.add_argument("--bm", required=True)
    pe.add_argument("--out", required=True)
    pe.add_argument("--radius", type=int, default=0,
                    help="band half-width in matrix indices (0 = full)")
    pe.add_argument("--min-r2", type=float, default=0.0)
    pi = sub.add_parser("index", help="export the variant index LUT")
    pi.add_argument("--ht", required=True)
    pi.add_argument("--out", required=True)
    a = p.parse_args(argv)
    if a.cmd == "entries":
        export_entries(a.bm, a.out, a.radius, a.min_r2)
    else:
        export_index(a.ht, a.out)


if __name__ == "__main__":
    main(sys.argv[1:])
