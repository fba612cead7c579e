"""PDF rendering of alignment visualizations (VizAlnPdf equivalent)."""

import re
import zlib


def test_html_to_pdf_structure():
    from tests.test_genotyper_e2e import run_locus
    from hipstr_tpu.pipeline.vcf_record import build_vcf_record, OutputConfig
    from hipstr_tpu.pipeline.viz import visualize_alignments
    from hipstr_tpu.pipeline.pdf import html_to_pdf

    locus, g, ok = run_locus(seed=3, reassemble=True)
    assert ok
    cfg = OutputConfig(viz_out=True)
    _, _, _, stats = build_vcf_record(g, g.sample_names, cfg)
    alns_by_sample = {}
    for s, entries in enumerate(stats.viz_data):
        if entries:
            alns_by_sample[g.sample_names[s]] = sorted(
                (a for _, a in entries), key=lambda a: a.start)
    html = visualize_alignments(alns_by_sample, stats.sample_gb,
                                locus.chrom_seq, locus.chrom,
                                locus.region.start, locus.region.stop)
    pdf = html_to_pdf(html)
    assert pdf.startswith(b"%PDF-1.4") and pdf.endswith(b"%%EOF\n")

    # xref offsets must point at their objects
    xref_pos = int(pdf.rsplit(b"startxref\n", 1)[1].split(b"\n")[0])
    tbl = pdf[xref_pos:].split(b"\n")
    n = int(tbl[1].split()[1])
    for i in range(1, n):
        off = int(tbl[2 + i].split()[0])
        assert pdf[off:off + 20].startswith(f"{i} 0 obj".encode())

    # content streams decompress to text-drawing operators
    m = re.search(rb"FlateDecode >>\nstream\n", pdf)
    body = zlib.decompress(pdf[m.end():pdf.index(b"\nendstream", m.end())])
    text = body.decode("latin1")
    assert "BT" in text and "Tj" in text and " re f" in text
    # sample names appear in the text grid
    assert any(name in text for name in g.sample_names)
