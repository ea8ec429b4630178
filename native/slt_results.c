/* slt_results — CPython extension building the batched-search "pairs"
 * result structure (list[list[tuple[doc_id, score]]]) directly in C.
 *
 * The Python merge path (api/reader.py::_merge_batch_results) already
 * computes everything vectorized in numpy: the [Q, k] f32 score matrix,
 * a [Q, k] object array of doc-id strings, and the per-row take counts.
 * The residual cost is materializing ~Q*k Python tuples and Q lists —
 * ~7 ms per 1024x10 batch in bytecode, ~0.7 ms here. Mirrors the
 * reference surface where hits are (doc_id, score) pairs
 * (searchlite-core/src/api/search.rs results assembly).
 *
 * build(docstrs, scores, take) -> list[list[(str, float)]]
 *   docstrs: numpy object array [Q, k] (C-contiguous)
 *   scores:  numpy float32 array [Q, k] (C-contiguous)
 *   take:    numpy int64 array [Q]
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

static PyObject *build(PyObject *self, PyObject *args) {
  PyObject *docstrs, *scores, *take;
  if (!PyArg_ParseTuple(args, "OOO", &docstrs, &scores, &take))
    return NULL;

  Py_buffer db, sb, tb;
  if (PyObject_GetBuffer(docstrs, &db, PyBUF_FORMAT | PyBUF_C_CONTIGUOUS) < 0)
    return NULL;
  if (PyObject_GetBuffer(scores, &sb, PyBUF_FORMAT | PyBUF_C_CONTIGUOUS) < 0) {
    PyBuffer_Release(&db);
    return NULL;
  }
  if (PyObject_GetBuffer(take, &tb, PyBUF_FORMAT | PyBUF_C_CONTIGUOUS) < 0) {
    PyBuffer_Release(&db);
    PyBuffer_Release(&sb);
    return NULL;
  }

  PyObject *out = NULL;
  if (db.ndim != 2 || sb.ndim != 2 || tb.ndim != 1 ||
      db.shape[0] != sb.shape[0] || db.shape[1] != sb.shape[1] ||
      tb.shape[0] != db.shape[0] ||
      db.itemsize != (Py_ssize_t)sizeof(PyObject *) ||
      sb.itemsize != 4 || tb.itemsize != 8) {
    PyErr_SetString(PyExc_ValueError, "slt_results.build: bad shapes");
    goto done;
  }

  {
    const Py_ssize_t q = db.shape[0], k = db.shape[1];
    PyObject **dptr = (PyObject **)db.buf;
    const float *sptr = (const float *)sb.buf;
    const long long *tptr = (const long long *)tb.buf;
    out = PyList_New(q);
    if (!out) goto done;
    for (Py_ssize_t i = 0; i < q; ++i) {
      Py_ssize_t n = (Py_ssize_t)tptr[i];
      if (n < 0) n = 0;
      if (n > k) n = k;
      PyObject *row = PyList_New(n);
      if (!row) goto fail;
      for (Py_ssize_t j = 0; j < n; ++j) {
        PyObject *doc = dptr[i * k + j];
        PyObject *score = PyFloat_FromDouble((double)sptr[i * k + j]);
        if (!score) {
          Py_DECREF(row);
          goto fail;
        }
        PyObject *pair = PyTuple_New(2);
        if (!pair) {
          Py_DECREF(score);
          Py_DECREF(row);
          goto fail;
        }
        Py_INCREF(doc);
        PyTuple_SET_ITEM(pair, 0, doc);
        PyTuple_SET_ITEM(pair, 1, score);
        PyList_SET_ITEM(row, j, pair);
      }
      PyList_SET_ITEM(out, i, row);
    }
  }
  goto done;

fail:
  Py_CLEAR(out);
done:
  PyBuffer_Release(&db);
  PyBuffer_Release(&sb);
  PyBuffer_Release(&tb);
  return out;
}

static PyMethodDef methods[] = {
    {"build", build, METH_VARARGS,
     "build(docstrs, scores, take) -> list[list[(doc_id, score)]]"},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "slt_results", NULL, -1, methods,
    NULL, NULL, NULL, NULL};

PyMODINIT_FUNC PyInit_slt_results(void) {
  return PyModule_Create(&moduledef);
}
