/* Test-fixture generator: build a .tbi for a bgzipped VCF with htslib
 * (interop oracle for io/tabix.py).  Usage: tbxgen file.vcf.gz */
#include <stdio.h>
#include "htslib/tbx.h"

int main(int argc, char** argv) {
    if (argc < 2) { fprintf(stderr, "usage: %s file.vcf.gz\n", argv[0]); return 2; }
    if (tbx_index_build(argv[1], 0, &tbx_conf_vcf) != 0) {
        fprintf(stderr, "tbx_index_build failed\n");
        return 1;
    }
    return 0;
}
