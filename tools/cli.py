"""sassy_ray CLI — the reference's ``sassy grep|search|filter|crispr``
surface plus the ER pipeline, on Ray Data.

    python tools/cli.py grep  -p ATCG -k 1 --alphabet dna input.fa -o /tmp/out
    python tools/cli.py grep  -p ATCG -k 1 --filter --invert input.fa -o /tmp/out
    python tools/cli.py crispr --guides guides.txt -k 1 --pam-length 3 input.fa -o /tmp/out
    python tools/cli.py demux --barcodes bcs.fa -k 3 reads.fastq.gz -o /tmp/out
    python tools/cli.py er    --docs docs.parquet --out /tmp/er --checkpoint /tmp/er_ck

Inputs: FASTA/FASTQ (.fa/.fasta/.fq/.fastq[.gz]) or parquet with
(doc_id, text) / (doc_id, spans) columns.  Owns its Ray session (guarded
init — the only places allowed to, per the driver contract).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def _read_input(path: str):
    import pyarrow as pa
    import ray.data as rd

    low = path.lower()
    if any(low.endswith(e) for e in (".fa", ".fasta", ".fq", ".fastq", ".fa.gz", ".fasta.gz", ".fq.gz", ".fastq.gz")):
        from sassy_ray.sources.fasta import read_fasta

        ds = read_fasta(path)
        return ds.map_batches(
            lambda b: pa.table({"doc_id": b.column("id"), "text": b.column("seq")}),
            batch_format="pyarrow",
        )
    ds = rd.read_parquet(path)
    cols = ds.schema().names
    if "spans" in cols:
        from sassy_ray.sources.docs import add_doc_text

        return ds.map_batches(add_doc_text, batch_format="pyarrow")
    assert "text" in cols and "doc_id" in cols, f"need doc_id+text or spans, got {cols}"
    return ds


def cmd_grep(args) -> None:
    _session(args.threads)
    from sassy_ray.pipelines.grep import GrepConfig, run_grep

    patterns = []
    if args.pattern:
        patterns.append(("p0", args.pattern.encode()))
    if args.pattern_file:
        with open(args.pattern_file) as f:
            # enumerate only non-empty stripped lines so blank lines never
            # leave gaps in the generated pN ids (same rule as barcode lists)
            for i, line in enumerate(l for l in (x.strip() for x in f) if l):
                patterns.append((f"p{i + 1}" if args.pattern else f"p{i}", line.encode()))
    if args.pattern_fasta:
        # the reference's --pattern-fasta: record ids become pat_ids
        from sassy_ray.sources.fasta import parse_fasta_bytes

        with open(args.pattern_fasta, "rb") as f:
            t = parse_fasta_bytes(f.read())
        for pid, seq in zip(t.column("id").to_pylist(), t.column("seq").to_pylist()):
            patterns.append((pid, seq.encode()))
    if not patterns:
        sys.exit("no patterns (-p / -l / --pattern-fasta)")
    if args.v2:
        # compatibility no-op: the packed suffix prefilter (sassy v2's
        # pattern tiling) engages automatically for multi-pattern runs
        print("[v2] packed suffix prefilter engages automatically for >=2 patterns")
    cfg = GrepConfig(
        patterns,
        k=args.k,
        alphabet=args.alphabet,
        rc=not args.no_rc,
        all_minima=args.all,
        only_best_match=args.best,
        max_n_frac=args.max_n_frac,
        sam=args.sam,
        invert=args.invert,
        preserve_order=args.preserve_order,
    )
    res = run_grep(_read_input(args.input), cfg)
    os.makedirs(args.out, exist_ok=True)
    wrote_any = False
    if args.filter or args.filter_out:
        dest = args.filter_out or os.path.join(args.out, "filtered")
        res["filtered"].write_parquet(dest)
        print(f"filtered records -> {dest}")
        wrote_any = True
    if not args.filter or args.matches_out:
        dest = args.matches_out or os.path.join(args.out, "matches")
        res["matches"].write_csv(dest)
        print(f"matches -> {dest} (8-col)")
        print(res["histogram"].to_string(index=False))
        wrote_any = True
    assert wrote_any


def cmd_crispr(args) -> None:
    _session(args.threads)
    from sassy_ray.pipelines.crispr import CrisprConfig, run_crispr

    with open(args.guides) as f:
        guides = [line.strip().encode() for line in f if line.strip()]
    cfg = CrisprConfig(
        guides,
        k=args.k,
        pam_length=args.pam_length,
        allow_pam_edits=args.allow_pam_edits,
        max_n_frac=args.max_n_frac,
        rc=not args.no_rc,
    )
    out, n = run_crispr(_read_input(args.input), cfg)
    os.makedirs(args.out, exist_ok=True)
    out.write_csv(os.path.join(args.out, "matches"))
    print(f"[MATCHES] Found {n} matches -> {args.out}/matches")


def cmd_demux(args) -> None:
    _session(args.threads)
    from sassy_ray.pipelines.demux import DemuxConfig, run_demux

    low = args.barcodes.lower()
    if any(low.endswith(e) for e in (".fa", ".fasta", ".fa.gz", ".fasta.gz")):
        from sassy_ray.sources.fasta import parse_fasta_bytes

        with open(args.barcodes, "rb") as f:
            t = parse_fasta_bytes(f.read())
        barcodes = [
            (i, s.encode()) for i, s in zip(t.column("id").to_pylist(), t.column("seq").to_pylist())
        ]
    else:
        with open(args.barcodes) as f:
            # enumerate only non-empty stripped lines: blank/whitespace lines
            # must not create gaps or shifts in the generated bc-NNN ids
            barcodes = [
                (f"bc-{i:03d}", line.encode())
                for i, line in enumerate(l for l in (x.strip() for x in f) if l)
            ]
    cfg = DemuxConfig(barcodes, k=args.k, alphabet=args.alphabet, rc=not args.no_rc)
    reads = _read_input(args.input)
    out = run_demux(reads, cfg, id_col="doc_id")
    os.makedirs(args.out, exist_ok=True)
    dest = os.path.join(args.out, "assignments")
    out.write_csv(dest)
    print(f"per-read best-barcode assignments -> {dest}")


def cmd_er(args) -> None:
    _session(args.threads)
    import ray.data as rd

    from sassy_ray.pipelines.er import ERConfig, run_er_pipeline
    from sassy_ray.stages.blocking import BlockingConfig
    from sassy_ray.stages.scoring import ScoreConfig

    docs = rd.read_parquet(args.docs)
    assert "spans" in docs.schema().names, "er expects the interleaved (doc_id, spans) table"
    cfg = ERConfig(
        blocking=BlockingConfig(q=args.q, rc_canonical=args.alphabet != "ascii_ci"),
        score=ScoreConfig(
            profile=args.alphabet,
            k_min=args.k_min,
            rel_k=args.rel_k,
            rc=args.alphabet in ("dna", "iupac"),
            lowercase=args.alphabet == "ascii_ci",
        ),
    )
    res = run_er_pipeline(docs, cfg, checkpoint_dir=args.checkpoint)
    os.makedirs(args.out, exist_ok=True)
    res["clusters"].write_parquet(os.path.join(args.out, "clusters"))
    res["labeled_docs"]().write_parquet(os.path.join(args.out, "labeled_docs"))
    print(f"clusters + labeled_docs -> {args.out}; stats: {res['stats']}")


def main() -> None:
    ap = argparse.ArgumentParser(prog="sassy_ray")
    ap.add_argument("--threads", type=int, default=None, help="ray num_cpus")
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("grep", help="approximate search / filter (sassy grep)")
    g.add_argument("input")
    g.add_argument("-p", "--pattern")
    g.add_argument("-l", "--pattern-file")
    g.add_argument("--pattern-fasta", help="patterns from a FASTA file (record ids = pat_ids)")
    g.add_argument("--v2", action="store_true", help="compat flag; prefilter is automatic")
    g.add_argument("--preserve-order", action="store_true", help="stream matches in input order (no sort)")
    g.add_argument("--matches-out", help="also write the 8-col match table here")
    g.add_argument("--filter-out", help="also write (non-)matching records here")
    g.add_argument("-k", type=int, default=1)
    g.add_argument("--alphabet", default="dna", choices=["dna", "iupac", "ascii", "ascii_ci"])
    g.add_argument("--no-rc", action="store_true")
    g.add_argument("--all", action="store_true", help="all end positions (search_all)")
    g.add_argument("--best", action="store_true", help="only best match per pair")
    g.add_argument("--max-n-frac", type=float, default=None)
    g.add_argument("--sam", action="store_true")
    g.add_argument("--filter", action="store_true", help="emit matching records instead of matches")
    g.add_argument("--invert", action="store_true")
    g.add_argument("-o", "--out", required=True)
    g.set_defaults(fn=cmd_grep)

    c = sub.add_parser("crispr", help="CRISPR off-target search")
    c.add_argument("input")
    c.add_argument("--guides", required=True)
    c.add_argument("-k", type=int, default=1)
    c.add_argument("--pam-length", type=int, default=3)
    c.add_argument("--allow-pam-edits", action="store_true")
    c.add_argument("--max-n-frac", type=float, default=1.0)
    c.add_argument("--no-rc", action="store_true")
    c.add_argument("-o", "--out", required=True)
    c.set_defaults(fn=cmd_crispr)

    d = sub.add_parser("demux", help="barcode demultiplex (per-read best assignment)")
    d.add_argument("--barcodes", required=True, help="FASTA or one-seq-per-line list")
    d.add_argument("-k", type=int, default=3)
    d.add_argument("--alphabet", default="dna", choices=["dna", "iupac", "ascii"])
    d.add_argument("--no-rc", action="store_true")
    d.add_argument("input")
    d.add_argument("-o", "--out", required=True)
    d.set_defaults(fn=cmd_demux)

    e = sub.add_parser("er", help="entity-resolution pipeline over interleaved docs")
    e.add_argument("--docs", required=True)
    e.add_argument("--alphabet", default="ascii_ci", choices=["dna", "iupac", "ascii_ci"])
    e.add_argument("--q", type=int, default=12)
    e.add_argument("--k-min", type=int, default=3)
    e.add_argument("--rel-k", type=float, default=0.03)
    e.add_argument("--checkpoint", default=None)
    e.add_argument("-o", "--out", required=True)
    e.set_defaults(fn=cmd_er)

    args = ap.parse_args()
    args.fn(args)
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
