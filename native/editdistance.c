/* Levenshtein edit distance C extension — replaces the reference's `editdistance`
 * C++ package (used by NeMo's WER metric, wer.py:351). Host-side, off the hot path.
 *
 * Exposes eval(a, b) where a and b are sequences of hashable Python objects; we
 * compare via PyObject_RichCompare(Py_EQ) so both token-id lists and word lists work.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdlib.h>

static PyObject *ed_eval(PyObject *self, PyObject *args) {
    PyObject *a_obj, *b_obj;
    if (!PyArg_ParseTuple(args, "OO", &a_obj, &b_obj)) return NULL;
    PyObject *a = PySequence_Fast(a_obj, "expected a sequence");
    if (!a) return NULL;
    PyObject *b = PySequence_Fast(b_obj, "expected a sequence");
    if (!b) { Py_DECREF(a); return NULL; }

    Py_ssize_t n = PySequence_Fast_GET_SIZE(a);
    Py_ssize_t m = PySequence_Fast_GET_SIZE(b);
    PyObject **av = PySequence_Fast_ITEMS(a);
    PyObject **bv = PySequence_Fast_ITEMS(b);

    long *prev = (long *)malloc(sizeof(long) * (size_t)(m + 1));
    long *cur = (long *)malloc(sizeof(long) * (size_t)(m + 1));
    if (!prev || !cur) {
        free(prev); free(cur); Py_DECREF(a); Py_DECREF(b);
        return PyErr_NoMemory();
    }
    for (Py_ssize_t j = 0; j <= m; j++) prev[j] = (long)j;
    for (Py_ssize_t i = 1; i <= n; i++) {
        cur[0] = (long)i;
        for (Py_ssize_t j = 1; j <= m; j++) {
            int eq = PyObject_RichCompareBool(av[i - 1], bv[j - 1], Py_EQ);
            if (eq < 0) { free(prev); free(cur); Py_DECREF(a); Py_DECREF(b); return NULL; }
            long sub = prev[j - 1] + (eq ? 0 : 1);
            long del = prev[j] + 1;
            long ins = cur[j - 1] + 1;
            long best = sub < del ? sub : del;
            cur[j] = best < ins ? best : ins;
        }
        long *tmp = prev; prev = cur; cur = tmp;
    }
    long result = prev[m];
    free(prev); free(cur);
    Py_DECREF(a); Py_DECREF(b);
    return PyLong_FromLong(result);
}

static PyMethodDef EdMethods[] = {
    {"eval", ed_eval, METH_VARARGS, "Levenshtein distance between two sequences."},
    {NULL, NULL, 0, NULL}
};

static struct PyModuleDef edmodule = {
    PyModuleDef_HEAD_INIT, "_editdistance", NULL, -1, EdMethods
};

PyMODINIT_FUNC PyInit__editdistance(void) {
    return PyModule_Create(&edmodule);
}
