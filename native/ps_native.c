/*
 * Native host-side decode finishing for pocketsphinx-tpu.
 *
 * The device emits dense per-frame records (exit scores / start frames /
 * predecessors / segment acoustics); turning them into hypotheses and
 * lattices is irregular pointer-ish work that belongs on the host — the
 * runtime role the reference implements in C (src/ngram_search.c
 * backtrace, src/ps_lattice.c DAG construction).  This module provides
 * the two O(T x W) kernels as a CPython extension (no external
 * dependencies; operates on NumPy buffers via the buffer protocol):
 *
 *   backtrace(escore, estf, eprw, final_w, T) -> [(w, start, end), ...]
 *   lattice_scan(escore, estf, eascr, thresh) ->
 *       (node_w, node_sf, link_src, link_dst, link_ef, link_ascr)
 *
 * Python fallbacks exist in search/lattice.py and search/ngram_flat.py;
 * this path takes over for large vocabularies / long recordings where
 * the pure-Python loops dominate host time.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    Py_buffer view;
    const char *base;
    Py_ssize_t rows, cols, rstride, cstride;
} mat_t;

static int
get_mat(PyObject *obj, mat_t *m, const char *fmt_want, const char *name)
{
    if (PyObject_GetBuffer(obj, &m->view, PyBUF_STRIDES | PyBUF_FORMAT) < 0)
        return -1;
    if (m->view.ndim != 2) {
        PyErr_Format(PyExc_ValueError, "%s must be 2-D", name);
        PyBuffer_Release(&m->view);
        return -1;
    }
    if (m->view.format && fmt_want
        && strcmp(m->view.format, fmt_want) != 0) {
        PyErr_Format(PyExc_ValueError, "%s must have format '%s', got '%s'",
                     name, fmt_want, m->view.format);
        PyBuffer_Release(&m->view);
        return -1;
    }
    m->base = (const char *) m->view.buf;
    m->rows = m->view.shape[0];
    m->cols = m->view.shape[1];
    m->rstride = m->view.strides[0];
    m->cstride = m->view.strides[1];
    return 0;
}

static inline float
mat_f32(const mat_t *m, Py_ssize_t r, Py_ssize_t c)
{
    return *(const float *) (m->base + r * m->rstride + c * m->cstride);
}

static inline int32_t
mat_i32(const mat_t *m, Py_ssize_t r, Py_ssize_t c)
{
    return *(const int32_t *) (m->base + r * m->rstride + c * m->cstride);
}

/* backtrace(escore f32[T,W], estf i32[T,W], eprw i32[T,W], final_w, T)
 * -> list of (w, start, end), in time order. */
static PyObject *
py_backtrace(PyObject *self, PyObject *args)
{
    PyObject *escore_o, *estf_o, *eprw_o;
    int final_w;
    Py_ssize_t T;
    mat_t escore, estf, eprw;

    (void) self;
    if (!PyArg_ParseTuple(args, "OOOin", &escore_o, &estf_o, &eprw_o,
                          &final_w, &T))
        return NULL;
    if (get_mat(escore_o, &escore, "f", "escore") < 0)
        return NULL;
    if (get_mat(estf_o, &estf, "i", "estf") < 0) {
        PyBuffer_Release(&escore.view);
        return NULL;
    }
    if (get_mat(eprw_o, &eprw, "i", "eprw") < 0) {
        PyBuffer_Release(&escore.view);
        PyBuffer_Release(&estf.view);
        return NULL;
    }
    if (T > escore.rows)
        T = escore.rows;

    PyObject *segs = PyList_New(0);
    if (segs == NULL)
        goto done;
    {
        Py_ssize_t t = T - 1;
        int w = final_w;
        while (t >= 0 && w >= 0 && w < escore.cols) {
            int s = mat_i32(&estf, t, w);
            PyObject *tup = Py_BuildValue("(iin)", w, s, t);
            if (tup == NULL || PyList_Append(segs, tup) < 0) {
                Py_XDECREF(tup);
                Py_CLEAR(segs);
                goto done;
            }
            Py_DECREF(tup);
            int p = mat_i32(&eprw, t, w);
            if (s <= 0 || p < 0)
                break;
            w = p;
            t = s - 1;
        }
    }
    if (PyList_Reverse(segs) < 0)
        Py_CLEAR(segs);
done:
    PyBuffer_Release(&escore.view);
    PyBuffer_Release(&estf.view);
    PyBuffer_Release(&eprw.view);
    return segs;
}

/* lattice_scan(escore f32[T,W], estf i32[T,W], eascr f32[T,W], thresh)
 * -> (bytes node_key i64[n_nodes*2], bytes links i64[n_links*3],
 *     bytes link_ascr f32[n_links])
 * Node keys are (w, sf) pairs; links are (src_node, dst_node, ef)
 * triples with the source word's segment acoustic score. */
static PyObject *
py_lattice_scan(PyObject *self, PyObject *args)
{
    PyObject *escore_o, *estf_o, *eascr_o;
    double thresh;
    mat_t escore, estf, eascr;

    (void) self;
    if (!PyArg_ParseTuple(args, "OOOd", &escore_o, &estf_o, &eascr_o,
                          &thresh))
        return NULL;
    if (get_mat(escore_o, &escore, "f", "escore") < 0)
        return NULL;
    if (get_mat(estf_o, &estf, "i", "estf") < 0) {
        PyBuffer_Release(&escore.view);
        return NULL;
    }
    if (get_mat(eascr_o, &eascr, "f", "eascr") < 0) {
        PyBuffer_Release(&escore.view);
        PyBuffer_Release(&estf.view);
        return NULL;
    }

    Py_ssize_t T = escore.rows, W = escore.cols;
    PyObject *result = NULL;
    /* node ids: hash (w, sf) -> index via a [W x T] grid (sf < T) */
    int32_t *node_id = malloc((size_t) W * (size_t) T * sizeof(int32_t));
    int64_t *node_keys = malloc((size_t) W * (size_t) T * 2 * sizeof(int64_t));
    /* per-frame plausible exit lists */
    int32_t *exit_node = malloc((size_t) T * (size_t) W * sizeof(int32_t));
    float *exit_ascr = malloc((size_t) T * (size_t) W * sizeof(float));
    int32_t *exit_cnt = calloc((size_t) T, sizeof(int32_t));
    int64_t *links = NULL;
    float *link_a = NULL;
    Py_ssize_t n_nodes = 0, n_links = 0, cap_links = 0;

    if (!node_id || !node_keys || !exit_node || !exit_ascr || !exit_cnt) {
        PyErr_NoMemory();
        goto done;
    }
    memset(node_id, 0xff, (size_t) W * (size_t) T * sizeof(int32_t));

    for (Py_ssize_t t = 0; t < T; t++) {
        /* per-frame best */
        float best = -1e30f;
        for (Py_ssize_t w = 0; w < W; w++) {
            float v = mat_f32(&escore, t, w);
            if (v > best)
                best = v;
        }
        float lim = best + (float) thresh;
        for (Py_ssize_t w = 0; w < W; w++) {
            float v = mat_f32(&escore, t, w);
            if (v < lim || v < -5e29f)
                continue;
            int sf = mat_i32(&estf, t, w);
            if (sf < 0 || sf > t)
                continue;
            Py_ssize_t slot = w * T + sf;
            if (node_id[slot] < 0) {
                node_id[slot] = (int32_t) n_nodes;
                node_keys[n_nodes * 2] = (int64_t) w;
                node_keys[n_nodes * 2 + 1] = (int64_t) sf;
                n_nodes++;
            }
            Py_ssize_t k = t * W + exit_cnt[t];
            exit_node[k] = node_id[slot];
            exit_ascr[k] = mat_f32(&eascr, t, w);
            exit_cnt[t]++;
        }
    }
    /* bucket nodes by start frame for O(1) link fan-out */
    int32_t *sf_cnt = calloc((size_t) T + 1, sizeof(int32_t));
    int32_t *sf_off = calloc((size_t) T + 2, sizeof(int32_t));
    int32_t *sf_nodes = malloc((size_t) n_nodes * sizeof(int32_t));
    if (!sf_cnt || !sf_off || !sf_nodes) {
        free(sf_cnt); free(sf_off); free(sf_nodes);
        PyErr_NoMemory();
        goto done;
    }
    for (Py_ssize_t n = 0; n < n_nodes; n++)
        sf_cnt[node_keys[n * 2 + 1]]++;
    for (Py_ssize_t t = 0; t <= T; t++)
        sf_off[t + 1] = sf_off[t] + sf_cnt[t];
    {
        int32_t *fill = calloc((size_t) T + 1, sizeof(int32_t));
        for (Py_ssize_t n = 0; n < n_nodes; n++) {
            int64_t sf = node_keys[n * 2 + 1];
            sf_nodes[sf_off[sf] + fill[sf]++] = (int32_t) n;
        }
        free(fill);
    }
    /* links: every exit at t connects to every node starting at t+1 */
    for (Py_ssize_t t = 0; t + 1 < T; t++) {
        for (Py_ssize_t i = 0; i < exit_cnt[t]; i++) {
            int src = exit_node[t * W + i];
            float a = exit_ascr[t * W + i];
            for (Py_ssize_t bi = sf_off[t + 1]; bi < sf_off[t + 2]; bi++) {
                Py_ssize_t n = sf_nodes[bi];
                if (n_links >= cap_links) {
                    cap_links = cap_links ? cap_links * 2 : 4096;
                    links = realloc(links, (size_t) cap_links * 3
                                    * sizeof(int64_t));
                    link_a = realloc(link_a, (size_t) cap_links
                                     * sizeof(float));
                    if (!links || !link_a) {
                        PyErr_NoMemory();
                        goto done;
                    }
                }
                links[n_links * 3] = src;
                links[n_links * 3 + 1] = n;
                links[n_links * 3 + 2] = t;
                link_a[n_links] = a;
                n_links++;
            }
        }
    }
    free(sf_cnt);
    free(sf_off);
    free(sf_nodes);
    result = Py_BuildValue(
        "(y#y#y#)",
        (const char *) node_keys, (Py_ssize_t) (n_nodes * 2
                                                * sizeof(int64_t)),
        (const char *) links, (Py_ssize_t) (n_links * 3 * sizeof(int64_t)),
        (const char *) link_a, (Py_ssize_t) (n_links * sizeof(float)));
done:
    free(node_id);
    free(node_keys);
    free(exit_node);
    free(exit_ascr);
    free(exit_cnt);
    free(links);
    free(link_a);
    PyBuffer_Release(&escore.view);
    PyBuffer_Release(&estf.view);
    PyBuffer_Release(&eascr.view);
    return result;
}

static PyMethodDef methods[] = {
    {"backtrace", py_backtrace, METH_VARARGS,
     "Viterbi word backtrace over dense exit records"},
    {"lattice_scan", py_lattice_scan, METH_VARARGS,
     "Plausible-exit scan + link enumeration for lattice construction"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "ps_native",
    "Native host-side decode finishing", -1, methods,
    NULL, NULL, NULL, NULL,
};

PyMODINIT_FUNC
PyInit_ps_native(void)
{
    return PyModule_Create(&moduledef);
}
