/* Test-fixture generator: BAM -> CRAM via htslib (the reference's vendored
 * library, used here purely as an interop oracle for our from-scratch CRAM
 * reader; reference: lib/htslib/cram/).  Usage:
 *   bam2cram in.bam ref.fa out.cram [3.0|2.1]
 * Also writes out.cram.crai. */
#include <stdio.h>
#include <string.h>
#include "htslib/sam.h"
#include "htslib/hts.h"

int main(int argc, char** argv) {
    if (argc < 4) { fprintf(stderr, "usage: %s in.bam ref.fa out.cram [ver]\n", argv[0]); return 2; }
    samFile* in = sam_open(argv[1], "r");
    if (!in) { perror("in"); return 1; }
    bam_hdr_t* hdr = sam_hdr_read(in);
    samFile* out = sam_open(argv[3], "wc");
    if (!out) { perror("out"); return 1; }
    if (argc > 4) hts_set_opt(out, CRAM_OPT_VERSION, argv[4]);
    if (hts_set_fai_filename(out, argv[2]) != 0) { fprintf(stderr, "fai\n"); return 1; }
    if (sam_hdr_write(out, hdr) != 0) { fprintf(stderr, "hdr\n"); return 1; }
    bam1_t* b = bam_init1();
    int r;
    while ((r = sam_read1(in, hdr, b)) >= 0)
        if (sam_write1(out, hdr, b) < 0) { fprintf(stderr, "write\n"); return 1; }
    bam_destroy1(b);
    sam_close(in);
    if (sam_close(out) != 0) { fprintf(stderr, "close\n"); return 1; }
    if (sam_index_build(argv[3], 0) != 0) { fprintf(stderr, "index\n"); return 1; }
    bam_hdr_destroy(hdr);
    return 0;
}
