/* Golden-capture tool: decode an utterance with the reference engine,
 * run bestpath + posterior on the IN-MEMORY lattice (the reference's
 * real semantics; its DAG file reader has a units quirk), and dump
 * hyp, P(S|O), per-segment posteriors, per-link alpha/beta/post, and
 * N-best.  Output committed under tests/golden/ as parity oracle. */
#include <pocketsphinx.h>
#include "ps_lattice_internal.h"
#include <stdio.h>
#include <stdlib.h>

int main(int argc, char *argv[])
{
    ps_decoder_t *ps;
    ps_config_t *config;
    ps_lattice_t *dag;
    ps_latlink_t *link;
    ps_nbest_t *nbest;
    ps_seg_t *seg;
    logmath_t *lmath;
    FILE *rawfh;
    const char *hyp;
    int32 score, post;
    int n;

    if (argc < 5) {
        fprintf(stderr, "usage: %s hmm lm dict raw\n", argv[0]);
        return 1;
    }
    config = ps_config_init(NULL);
    ps_config_set_str(config, "hmm", argv[1]);
    ps_config_set_str(config, "lm", argv[2]);
    ps_config_set_str(config, "dict", argv[3]);
    ps_config_set_str(config, "loglevel", "ERROR");
    ps_config_set_bool(config, "bestpath", 1);
    ps = ps_init(config);
    if (!ps) return 1;
    rawfh = fopen(argv[4], "rb");
    if (!rawfh) return 1;
    ps_decode_raw(ps, rawfh, -1);
    fclose(rawfh);
    hyp = ps_get_hyp(ps, &score);
    lmath = ps_get_logmath(ps);
    printf("HYP: %s (%d)\n", hyp, score);
    post = ps_get_prob(ps);
    printf("PROB: %d %.6f\n", post, logmath_exp(lmath, post));
    for (seg = ps_seg_iter(ps); seg; seg = ps_seg_next(seg)) {
        int sf, ef;
        int32 lscr, ascr, lback;
        int32 p = ps_seg_prob(seg, &ascr, &lscr, &lback);
        ps_seg_frames(seg, &sf, &ef);
        printf("SEG %s %d %d ascr %d lscr %d post %.6f\n",
               ps_seg_word(seg), sf, ef, ascr, lscr,
               logmath_exp(lmath, p));
    }
    dag = ps_get_lattice(ps);
    if (dag) {
        for (link = ps_lattice_traverse_edges(dag, NULL, NULL);
             link; link = ps_lattice_traverse_next(dag, NULL)) {
            int32 ascr, prob;
            int16 sf, ef;
            ps_latnode_t *src;
            prob = ps_latlink_prob(dag, link, &ascr);
            ef = ps_latlink_times(link, &sf);
            ps_latlink_nodes(link, &src);
            printf("LINK %s %d %d -> %s %.6f\n",
                   ps_latlink_word(dag, link), sf, ef,
                   ps_latnode_word(dag, ps_latlink_nodes(link, NULL)),
                   logmath_exp(lmath, prob));
        }
        /* Full-graph dump (LINKG): unlike ps_lattice_write, which
         * drops ascr>0 links, this records every in-memory link with
         * its node start frames and acoustic score so the exact graph
         * can be reconstructed for all-link posterior parity tests. */
        for (link = ps_lattice_traverse_edges(dag, NULL, NULL);
             link; link = ps_lattice_traverse_next(dag, NULL)) {
            int32 ascr, prob;
            int16 sf, ef;
            ps_latnode_t *src, *dst;
            prob = ps_latlink_prob(dag, link, &ascr);
            ef = ps_latlink_times(link, &sf);
            dst = ps_latlink_nodes(link, &src);
            printf("LINKG %s %d %d -> %s %d ascr %d post %.6f\n",
                   ps_latnode_word(dag, src), sf, ef,
                   ps_latnode_word(dag, dst),
                   ps_latnode_times(dst, NULL, NULL),
                   ascr, logmath_exp(lmath, prob));
        }
        {
            /* internal struct access (built with -I$REF/src): end
             * node identity, implicit final link ascr, normalizer */
            printf("ENDG %s %d final_node_ascr %d norm %d\n",
                   ps_latnode_word(dag, dag->end),
                   ps_latnode_times(dag->end, NULL, NULL),
                   dag->final_node_ascr, dag->norm);
        }
    }
    for (n = 1, nbest = ps_nbest(ps); nbest && n <= 10;
         nbest = ps_nbest_next(nbest), n++) {
        hyp = ps_nbest_hyp(nbest, &score);
        printf("NBEST %d: %s (%d)\n", n, hyp ? hyp : "(null)", score);
    }
    if (nbest)
        ps_nbest_free(nbest);
    ps_free(ps);
    ps_config_free(config);
    return 0;
}
