#!/bin/bash
# Build the reference NextPolish engines as shared objects for the parity
# harness (tools/ref_parity.py).  Builds OUTSIDE the repo in /tmp from a
# copy of the read-only reference tree; bz2/lzma are stubbed out (only the
# CRAM codecs need them and we never use CRAM).
set -e
REF=${1:-/root/reference/source}
DST=/tmp/refbuild
STUBINC=/tmp/stubinc
STUBLIB=/tmp/stublib

build_aligners() {
  # The reference's vendored aligners, as *validation oracles* (never
  # shipped): bwa mem / samtools / minimap2 let the accuracy harness run
  # the reference's own mapping commands side-by-side with the built-in
  # mapper (tools/accuracy_bench.py, docs/VALIDATION.md).
  if [ ! -x $DST/util/bwa/bwa ]; then
    make -C $DST/util/bwa -j8 \
      CFLAGS="-g -Wall -Wno-unused-function -O2 -fcommon" >/dev/null
  fi
  if [ ! -x $DST/util/minimap2/minimap2 ]; then
    make -C $DST/util/minimap2 -j8 >/dev/null
  fi
  if [ ! -x $DST/util/samtools/samtools ]; then
    # curses is only needed by tview, which we never run: stub it
    mkdir -p $STUBLIB
    if [ ! -f $STUBLIB/libcurses.a ]; then
      ( cd $STUBLIB && echo "void __npt_stub_curses(void){}" > c.c && \
        gcc -c c.c && ar rcs libcurses.a c.o )
    fi
    ( cd $DST/util/samtools && \
      printf '/* no curses */\n' > config.h && \
      sed -i 's/^CURSES_LIB = .*/CURSES_LIB =/' config.mk 2>/dev/null; \
      make -j8 HTSDIR=$DST/lib/htslib \
        CFLAGS="-g -Wall -O2 -fcommon -I$STUBINC" \
        LDFLAGS="-L$STUBLIB" LIBCURSES= samtools >/dev/null )
  fi
  echo "aligners: $DST/util/bwa/bwa $DST/util/samtools/samtools $DST/util/minimap2/minimap2"
  build_pipeline_bits
}

build_pipeline_bits() {
  # Everything the reference *pipeline driver* additionally needs so
  # tools/run_reference_pipeline.py can run `nextPolish run.cfg` end to end:
  # seq_split/seq_count, calgs.so, and the bin/ copies the driver shells out
  # to (source/Makefile:5-21 layout).
  if [ ! -x $DST/util/seq_split ]; then
    make -C $DST/util seq_split seq_count >/dev/null
  fi
  if [ ! -f $DST/lib/calgs.so ]; then
    make -C $DST/lib calgs.so >/dev/null
  fi
  mkdir -p $DST/bin
  for b in util/seq_split util/seq_count util/bwa/bwa util/samtools/samtools \
           util/minimap2/minimap2; do
    cp -u $DST/$b $DST/bin/ 2>/dev/null || cp $DST/$b $DST/bin/
  done
  echo "pipeline bits: $DST/bin"
}

if [ -f $DST/lib/nextpolish1.so ] && [ -f $DST/lib/nextpolish2.so ]; then
  echo "already built: $DST/lib/nextpolish{1,2}.so"
  build_aligners
  exit 0
fi

rm -rf $DST && cp -r $REF $DST

mkdir -p $STUBINC $STUBLIB
cat > $STUBINC/bzlib.h <<'EOF'
#ifndef STUB_BZLIB_H
#define STUB_BZLIB_H
#define BZ_OK 0
static inline int BZ2_bzBuffToBuffCompress(char* d, unsigned* dl, char* s, unsigned sl, int b, int v, int w){ (void)d;(void)dl;(void)s;(void)sl;(void)b;(void)v;(void)w; return -1; }
static inline int BZ2_bzBuffToBuffDecompress(char* d, unsigned* dl, char* s, unsigned sl, int sm, int v){ (void)d;(void)dl;(void)s;(void)sl;(void)sm;(void)v; return -1; }
#endif
EOF
cat > $STUBINC/lzma.h <<'EOF'
#ifndef STUB_LZMA_H
#define STUB_LZMA_H
#include <stdint.h>
#include <stddef.h>
typedef int lzma_ret;
typedef int lzma_action;
typedef struct { const uint8_t *next_in; size_t avail_in; uint64_t total_in; uint8_t *next_out; size_t avail_out; uint64_t total_out; void* a; void* i; void* r1; void* r2; void* r3; void* r4; uint64_t s1; uint64_t s2; size_t s3; size_t s4; int e1; int e2; int e3; } lzma_stream;
#define LZMA_STREAM_INIT {0}
#define LZMA_OK 0
#define LZMA_STREAM_END 1
#define LZMA_RUN 0
#define LZMA_FINISH 3
#define LZMA_PRESET_DEFAULT 6
#define LZMA_CHECK_CRC32 1
#define LZMA_CONCATENATED 0x08
static inline size_t lzma_stream_buffer_bound(size_t n){ return n + n/3 + 128; }
static inline lzma_ret lzma_easy_buffer_encode(uint32_t p, int c, void* a, const uint8_t* in, size_t isz, uint8_t* out, size_t* op, size_t osz){ (void)p;(void)c;(void)a;(void)in;(void)isz;(void)out;(void)op;(void)osz; return 11; }
static inline uint64_t lzma_easy_decoder_memusage(uint32_t p){ (void)p; return 0; }
static inline lzma_ret lzma_stream_decoder(lzma_stream* s, uint64_t m, uint32_t f){ (void)s;(void)m;(void)f; return 11; }
static inline lzma_ret lzma_code(lzma_stream* s, lzma_action a){ (void)s;(void)a; return 11; }
static inline void lzma_end(lzma_stream* s){ (void)s; }
#endif
EOF
echo "void __npt_stub_bz2(void){}" > $STUBLIB/b.c
echo "void __npt_stub_lzma(void){}" > $STUBLIB/l.c
(cd $STUBLIB && gcc -c b.c l.c && ar rcs libbz2.a b.o && ar rcs liblzma.a l.o)

cd $DST/lib

# Test instrumentation for the scratch copy (never touches the read-only
# reference): NPT_NO_LQ disables LQ repair to expose the pre-repair
# consensus; NPT_TEST_OVERLAP shrinks the window overlap so multi-window
# stitching is testable on small contigs.
python3 - <<'PYEOF'
src = open('ctg_cns.c').read()
old = """	int lqseqs_count = 0;
	lqseq *lqseqs = get_lqseqs_from_gap(msa, &consensus, &lqseqs_count, clusters);
	free_msa(msa, len);"""
new = """	int lqseqs_count = 0;
	lqseq *lqseqs = get_lqseqs_from_gap(msa, &consensus, &lqseqs_count, clusters);
	if (getenv("NPT_NO_LQ")) lqseqs_count = 0;
	free_msa(msa, len);"""
assert src.count(old) == 1
src = src.replace(old, new)
old = """	cfg->consensus_t.i_m = 5;
	cfg->consensus_t.s = 1000000;
	if (!consensus_w) consensus_w = 40000000;"""
new = """	cfg->consensus_t.i_m = 5;
	cfg->consensus_t.s = 1000000;
	{ char *e = getenv("NPT_TEST_OVERLAP"); if (e) cfg->consensus_t.s = atoi(e); }
	if (!consensus_w) consensus_w = 40000000;"""
assert src.count(old) == 1
src = src.replace(old, new)
open('ctg_cns.c','w').write(src)
print("instrumentation patches applied")
PYEOF

# Build libhts.a only (the .pico shared-lib objects need real bz2/lzma
# headers at their default CFLAGS, and the lib/Makefile `htslib_` target
# re-invokes htslib's full default target — so bypass make for the link).
make -C htslib CFLAGS="-g -Wall -O2 -I. -I$STUBINC -fPIC" libhts.a
for f in main snpvalid snpphase kmercount lgspolish scorechain contig base seqlist config; do
  gcc -I. -I./htslib -I$STUBINC -Wall -O3 -std=c99 -fPIC -o $f.o -c $f.c
done
gcc -Wall -O3 -std=c99 -fPIC -shared -o nextpolish1.so \
  main.o snpvalid.o snpphase.o kmercount.o lgspolish.o scorechain.o \
  contig.o base.o seqlist.o config.o htslib/libhts.a \
  -lpthread -lm -L$STUBLIB -lbz2 -llzma -lz
gcc -Wall -O3 -std=c99 -fPIC -shared -Wno-unused-function -DLGS_CORRECT \
  -D_SVID_SOURCE -o nextpolish2.so bseq.c align.c bsort.c dag.c ctg_cns.c \
  htslib/libhts.a -I. -I./htslib -I$STUBINC \
  -lpthread -lm -L$STUBLIB -lbz2 -llzma -lz
echo "built: $DST/lib/nextpolish1.so $DST/lib/nextpolish2.so"
build_aligners
