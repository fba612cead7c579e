/* Interop oracle: count records htslib's tabix returns for a region.
 * Usage: tbxq file.vcf.gz chr:beg-end   (prints the count) */
#include <stdio.h>
#include "htslib/hts.h"
#include "htslib/tbx.h"
#include "htslib/kstring.h"

int main(int argc, char** argv) {
    if (argc < 3) { fprintf(stderr, "usage: %s file.vcf.gz region\n", argv[0]); return 2; }
    htsFile* fp = hts_open(argv[1], "r");
    tbx_t* tbx = tbx_index_load(argv[1]);
    if (!fp || !tbx) { fprintf(stderr, "open failed\n"); return 1; }
    hts_itr_t* itr = tbx_itr_querys(tbx, argv[2]);
    long n = 0;
    kstring_t s = {0, 0, 0};
    if (itr) while (tbx_itr_next(fp, tbx, itr, &s) >= 0) ++n;
    printf("%ld\n", n);
    return 0;
}
