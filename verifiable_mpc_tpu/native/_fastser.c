/* _fastser: CPython C-API fast paths for the per-element hot loops.
 *
 * The Fiat-Shamir transcript encoder (serialization.py:_hash_list_fast) and
 * the Python<->limb-array conversions (native/__init__.py:_ints_to_u64x4,
 * _pts_to_u64, _u64_to_pts) walk lists of Python bigints / field elements /
 * curve points element by element; at 2^16-gate circuits those loops cost
 * seconds per proof (profiled: ~5s hashing + ~3s conversions at 2^14).
 * ctypes cannot walk PyObject lists, so this extension does it with the
 * C API: PyList iteration, slot attribute loads, and direct
 * _PyLong_AsByteArray / _PyLong_FromByteArray exports.
 *
 * Byte-format contracts (pinned by the golden-transcript tests):
 *   - ints hash as T_INT(0x01) + u32be(len) + minimal signed big-endian
 *     bytes, len = bit_length()//8 + 1  (serialization._int_raw);
 *   - field elements hash as their signed representative
 *     (v - modulus if signed and v > modulus // 2);
 *   - Edwards points as T_ED(0x12) + 4 coordinate records, BN G1 points as
 *     T_BN(0x13) + 3 records (serialization._hash_list_fast);
 *   - u64x4 rows are 32-byte little-endian (native/__init__.py).
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <string.h>

/* ---------------------------------------------------------------- buffer */

typedef struct {
    unsigned char *data;
    Py_ssize_t len;
    Py_ssize_t cap;
} Buf;

static int buf_init(Buf *b, Py_ssize_t cap) {
    b->data = PyMem_Malloc(cap);
    b->len = 0;
    b->cap = cap;
    return b->data ? 0 : -1;
}

static unsigned char *buf_reserve(Buf *b, Py_ssize_t extra) {
    if (b->len + extra > b->cap) {
        Py_ssize_t cap = b->cap * 2;
        while (cap < b->len + extra) cap *= 2;
        unsigned char *nd = PyMem_Realloc(b->data, cap);
        if (!nd) return NULL;
        b->data = nd;
        b->cap = cap;
    }
    return b->data + b->len;
}

static void buf_free(Buf *b) { PyMem_Free(b->data); }

/* minimal signed big-endian int record: u32be(len) + bytes.
 * Matches serialization._int_raw: len = bit_length // 8 + 1. */
static int write_int_record(Buf *b, PyObject *v) {
    if (!PyLong_Check(v)) {
        PyErr_SetString(PyExc_TypeError, "expected int attribute");
        return -1;
    }
    size_t nbits = _PyLong_NumBits(v);
    if (nbits == (size_t)-1 && PyErr_Occurred()) return -1;
    Py_ssize_t nbytes = (Py_ssize_t)(nbits / 8) + 1;
    unsigned char *dst = buf_reserve(b, 4 + nbytes);
    if (!dst) return -1;
    dst[0] = (unsigned char)(nbytes >> 24);
    dst[1] = (unsigned char)(nbytes >> 16);
    dst[2] = (unsigned char)(nbytes >> 8);
    dst[3] = (unsigned char)nbytes;
    if (_PyLong_AsByteArray((PyLongObject *)v, dst + 4, (size_t)nbytes,
                            /*little_endian=*/0, /*is_signed=*/1) < 0)
        return -1;
    b->len += 4 + nbytes;
    return 0;
}

/* ------------------------------------------------------------ interned */

static PyObject *str_value; /* "value" */
static PyObject *str_c0;    /* "c0" (GF(p^2) slot) */
static PyObject *str_c1;    /* "c1" */

/* v.value for slot classes; returns new ref */
static inline PyObject *get_value(PyObject *v) {
    return PyObject_GetAttr(v, str_value);
}

/* all interned attribute names materialized? (PyUnicode_InternFromString
 * can return NULL on memory pressure; using a NULL name would crash in
 * PyObject_GetAttr).  On failure an exception is already set. */
static inline int names_ok(PyObject **names, int k) {
    for (int j = 0; j < k; j++)
        if (!names[j]) return 0;
    return 1;
}

/* checked export of an int-valued attribute as 32 LE bytes: a non-int
 * (e.g. a wrapper field element) raises TypeError instead of the UB of
 * casting an arbitrary object to PyLongObject*. */
static inline int long_to_le32(PyObject *v, unsigned char *dst) {
    if (!PyLong_Check(v)) {
        PyErr_Format(PyExc_TypeError,
                     "expected int attribute, got %.100s",
                     Py_TYPE(v)->tp_name);
        return -1;
    }
    return _PyLong_AsByteArray((PyLongObject *)v, dst, 32, 1, 0);
}

/* reject buffers whose length is not an exact row multiple: silently
 * dropping a partial trailing row would return a truncated list.
 * Releases the view on failure. */
static int check_rows(Py_buffer *view, Py_ssize_t row) {
    if (view->len % row) {
        PyErr_Format(PyExc_ValueError,
                     "buffer length %zd is not a multiple of row size %zd",
                     view->len, row);
        PyBuffer_Release(view);
        return -1;
    }
    return 0;
}

/* -------------------------------------------------------------- encode */

/* encode_vals(seq, ftype, half, modulus) -> bytes | None | element
 *
 * bytes: the concatenated T_INT records for every element (exact ints raw,
 *   exact-ftype field elements as their signed representative).
 * None: an element is neither an exact int nor an exact ftype instance —
 *   caller falls back to the generic path.
 * element (anything else): ftype was None and a non-int element was found;
 *   the caller inspects its type and retries with ftype/half/modulus set.
 *
 * half is None for unsigned field types, else modulus // 2. */
static PyObject *encode_vals(PyObject *self, PyObject *args) {
    PyObject *seq, *ftype, *half, *modulus;
    if (!PyArg_ParseTuple(args, "OOOO", &seq, &ftype, &half, &modulus))
        return NULL;
    PyObject **items;
    Py_ssize_t n;
    if (PyList_CheckExact(seq)) {
        items = ((PyListObject *)seq)->ob_item;
        n = PyList_GET_SIZE(seq);
    } else if (PyTuple_CheckExact(seq)) {
        items = ((PyTupleObject *)seq)->ob_item;
        n = PyTuple_GET_SIZE(seq);
    } else {
        PyErr_SetString(PyExc_TypeError, "expected list or tuple");
        return NULL;
    }

    Buf b;
    if (buf_init(&b, 64 + n * 40)) return PyErr_NoMemory();

    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *v = items[i];
        unsigned char *tag = buf_reserve(&b, 1);
        if (!tag) goto fail;
        *tag = 0x01; /* T_INT */
        b.len += 1;
        if (PyLong_CheckExact(v)) {
            if (write_int_record(&b, v) < 0) goto fail;
        } else if ((PyObject *)Py_TYPE(v) == ftype && ftype != Py_None) {
            PyObject *val = get_value(v);
            if (!val) goto fail;
            if (half != Py_None) {
                int gt = PyObject_RichCompareBool(val, half, Py_GT);
                if (gt < 0) { Py_DECREF(val); goto fail; }
                if (gt) {
                    PyObject *adj = PyNumber_Subtract(val, modulus);
                    Py_DECREF(val);
                    if (!adj) goto fail;
                    val = adj;
                }
            }
            int rc = write_int_record(&b, val);
            Py_DECREF(val);
            if (rc < 0) goto fail;
        } else {
            buf_free(&b);
            if (ftype == Py_None) return Py_NewRef(v);
            Py_RETURN_NONE;
        }
    }
    {
        PyObject *out = PyBytes_FromStringAndSize((char *)b.data, b.len);
        buf_free(&b);
        return out;
    }
fail:
    buf_free(&b);
    return NULL;
}

/* encode_ed_points(seq, ptype) -> bytes | None
 * T_ED(0x12) + int records for x, y, z, t (plain nonneg ints). */
static PyObject *encode_ed_points(PyObject *self, PyObject *args) {
    PyObject *seq, *ptype;
    if (!PyArg_ParseTuple(args, "OO", &seq, &ptype)) return NULL;
    if (!PyList_CheckExact(seq)) {
        PyErr_SetString(PyExc_TypeError, "expected list");
        return NULL;
    }
    Py_ssize_t n = PyList_GET_SIZE(seq);
    Buf b;
    if (buf_init(&b, 64 + n * 160)) return PyErr_NoMemory();
    PyObject *names[4] = {NULL, NULL, NULL, NULL};
    names[0] = PyUnicode_InternFromString("x");
    names[1] = PyUnicode_InternFromString("y");
    names[2] = PyUnicode_InternFromString("z");
    names[3] = PyUnicode_InternFromString("t");
    if (!names_ok(names, 4)) goto fail;

    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *p = PyList_GET_ITEM(seq, i);
        if ((PyObject *)Py_TYPE(p) != ptype) {
            buf_free(&b);
            for (int j = 0; j < 4; j++) Py_XDECREF(names[j]);
            Py_RETURN_NONE;
        }
        unsigned char *tag = buf_reserve(&b, 1);
        if (!tag) goto fail;
        *tag = 0x12; /* T_ED */
        b.len += 1;
        for (int j = 0; j < 4; j++) {
            PyObject *c = PyObject_GetAttr(p, names[j]);
            if (!c) goto fail;
            int rc = write_int_record(&b, c);
            Py_DECREF(c);
            if (rc < 0) goto fail;
        }
    }
    {
        PyObject *out = PyBytes_FromStringAndSize((char *)b.data, b.len);
        buf_free(&b);
        for (int j = 0; j < 4; j++) Py_XDECREF(names[j]);
        return out;
    }
fail:
    buf_free(&b);
    for (int j = 0; j < 4; j++) Py_XDECREF(names[j]);
    return NULL;
}

/* encode_bn_points(seq, ptype) -> bytes | None
 * T_BN(0x13) + int records for x.value, y.value, z.value. */
static PyObject *encode_bn_points(PyObject *self, PyObject *args) {
    PyObject *seq, *ptype;
    if (!PyArg_ParseTuple(args, "OO", &seq, &ptype)) return NULL;
    if (!PyList_CheckExact(seq)) {
        PyErr_SetString(PyExc_TypeError, "expected list");
        return NULL;
    }
    Py_ssize_t n = PyList_GET_SIZE(seq);
    Buf b;
    if (buf_init(&b, 64 + n * 120)) return PyErr_NoMemory();
    PyObject *names[3];
    names[0] = PyUnicode_InternFromString("x");
    names[1] = PyUnicode_InternFromString("y");
    names[2] = PyUnicode_InternFromString("z");
    if (!names_ok(names, 3)) goto fail;

    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *p = PyList_GET_ITEM(seq, i);
        if ((PyObject *)Py_TYPE(p) != ptype) {
            buf_free(&b);
            for (int j = 0; j < 3; j++) Py_XDECREF(names[j]);
            Py_RETURN_NONE;
        }
        unsigned char *tag = buf_reserve(&b, 1);
        if (!tag) goto fail;
        *tag = 0x13; /* T_BN */
        b.len += 1;
        for (int j = 0; j < 3; j++) {
            PyObject *c = PyObject_GetAttr(p, names[j]);
            if (!c) goto fail;
            PyObject *val = get_value(c);
            Py_DECREF(c);
            if (!val) goto fail;
            int rc = write_int_record(&b, val);
            Py_DECREF(val);
            if (rc < 0) goto fail;
        }
    }
    {
        PyObject *out = PyBytes_FromStringAndSize((char *)b.data, b.len);
        buf_free(&b);
        for (int j = 0; j < 3; j++) Py_XDECREF(names[j]);
        return out;
    }
fail:
    buf_free(&b);
    for (int j = 0; j < 3; j++) Py_XDECREF(names[j]);
    return NULL;
}

/* ---------------------------------------------------------- conversions */

/* export one nonneg int < 2^256 as 32 little-endian bytes; reduces mod
 * modulus first when the direct export overflows or the value is negative */
static int export_u64x4(PyObject *v, PyObject *modulus, unsigned char *dst) {
    if (!PyLong_Check(v)) {
        PyErr_SetString(PyExc_TypeError, "expected int value");
        return -1;
    }
    if (_PyLong_Sign(v) >= 0) {
        int ge = PyObject_RichCompareBool(v, modulus, Py_GE);
        if (ge < 0) return -1;
        if (!ge)
            return _PyLong_AsByteArray((PyLongObject *)v, dst, 32, 1, 0);
    }
    PyObject *red = PyNumber_Remainder(v, modulus);
    if (!red) return -1;
    int rc = _PyLong_AsByteArray((PyLongObject *)red, dst, 32, 1, 0);
    Py_DECREF(red);
    return rc;
}

/* vals_to_u64x4(seq, ftype, modulus, int_mode=1) -> bytes (n*32,
 * little-endian rows).
 * elements: exact ints (reduced mod modulus if out of range) or exact
 * ftype instances (their .value, already reduced).  Returns None if an
 * element is neither.  int_mode gates which plain ints are accepted — the
 * Python expressions these conversions replace only stay reduced-field-
 * element-exact for certain int mixes (ops/modvec.py guards):
 *   0 = ints rejected, 1 = any int allowed, 2 = only the int 0 allowed. */
static PyObject *vals_to_u64x4(PyObject *self, PyObject *args) {
    PyObject *seq, *ftype, *modulus;
    int int_mode = 1;
    if (!PyArg_ParseTuple(args, "OOO|i", &seq, &ftype, &modulus, &int_mode))
        return NULL;
    PyObject **items;
    Py_ssize_t n;
    if (PyList_CheckExact(seq)) {
        items = ((PyListObject *)seq)->ob_item;
        n = PyList_GET_SIZE(seq);
    } else if (PyTuple_CheckExact(seq)) {
        items = ((PyTupleObject *)seq)->ob_item;
        n = PyTuple_GET_SIZE(seq);
    } else {
        PyErr_SetString(PyExc_TypeError, "expected list or tuple");
        return NULL;
    }
    PyObject *out = PyBytes_FromStringAndSize(NULL, n * 32);
    if (!out) return NULL;
    unsigned char *dst = (unsigned char *)PyBytes_AS_STRING(out);
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *v = items[i];
        if (PyLong_CheckExact(v)) {
            if (int_mode == 0 ||
                (int_mode == 2 && _PyLong_Sign(v) != 0)) {
                Py_DECREF(out);
                Py_RETURN_NONE;
            }
            if (export_u64x4(v, modulus, dst + i * 32) < 0) goto fail;
        } else if ((PyObject *)Py_TYPE(v) == ftype && ftype != Py_None) {
            PyObject *val = get_value(v);
            if (!val) goto fail;
            int rc = export_u64x4(val, modulus, dst + i * 32);
            Py_DECREF(val);
            if (rc < 0) goto fail;
        } else {
            Py_DECREF(out);
            Py_RETURN_NONE;
        }
    }
    return out;
fail:
    Py_DECREF(out);
    return NULL;
}

/* ed_pts_to_u64(seq, ptype) -> bytes (n*128: x,y,z,t each 32 LE bytes)
 * Returns None if an element is not an exact ptype instance. */
static PyObject *ed_pts_to_u64(PyObject *self, PyObject *args) {
    PyObject *seq, *ptype;
    if (!PyArg_ParseTuple(args, "OO", &seq, &ptype)) return NULL;
    if (!PyList_CheckExact(seq)) {
        PyErr_SetString(PyExc_TypeError, "expected list");
        return NULL;
    }
    Py_ssize_t n = PyList_GET_SIZE(seq);
    PyObject *names[4];
    names[0] = PyUnicode_InternFromString("x");
    names[1] = PyUnicode_InternFromString("y");
    names[2] = PyUnicode_InternFromString("z");
    names[3] = PyUnicode_InternFromString("t");
    PyObject *out =
        names_ok(names, 4) ? PyBytes_FromStringAndSize(NULL, n * 128) : NULL;
    if (!out) goto fail0;
    unsigned char *dst = (unsigned char *)PyBytes_AS_STRING(out);
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *p = PyList_GET_ITEM(seq, i);
        if ((PyObject *)Py_TYPE(p) != ptype) {
            Py_DECREF(out);
            for (int j = 0; j < 4; j++) Py_XDECREF(names[j]);
            Py_RETURN_NONE;
        }
        for (int j = 0; j < 4; j++) {
            PyObject *c = PyObject_GetAttr(p, names[j]);
            if (!c) goto fail;
            if (!PyLong_Check(c)) {
                Py_DECREF(c);
                PyErr_SetString(PyExc_TypeError, "expected int coordinate");
                goto fail;
            }
            int rc = _PyLong_AsByteArray((PyLongObject *)c,
                                         dst + i * 128 + j * 32, 32, 1, 0);
            Py_DECREF(c);
            if (rc < 0) goto fail;
        }
    }
    for (int j = 0; j < 4; j++) Py_XDECREF(names[j]);
    return out;
fail:
    Py_DECREF(out);
fail0:
    for (int j = 0; j < 4; j++) Py_XDECREF(names[j]);
    return NULL;
}

/* u64x4_to_ints(buffer) -> list of ints (32-byte little-endian rows) */
static PyObject *u64x4_to_ints(PyObject *self, PyObject *args) {
    Py_buffer view;
    if (!PyArg_ParseTuple(args, "y*", &view)) return NULL;
    if (check_rows(&view, 32)) return NULL;
    Py_ssize_t n = view.len / 32;
    PyObject *out = PyList_New(n);
    if (!out) { PyBuffer_Release(&view); return NULL; }
    const unsigned char *src = view.buf;
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *v = _PyLong_FromByteArray(src + i * 32, 32, 1, 0);
        if (!v) { Py_DECREF(out); PyBuffer_Release(&view); return NULL; }
        PyList_SET_ITEM(out, i, v);
    }
    PyBuffer_Release(&view);
    return out;
}

/* u64x4_to_vals(buffer, ftype) -> list of ftype instances.
 * Rows are 32-byte little-endian values ALREADY reduced to [0, modulus)
 * (the native modvec kernels' output contract), so construction skips
 * ftype.__init__ (whose `value % modulus` is the per-element hot cost)
 * and sets the `value` slot directly via tp_new + SetAttr. */
static PyObject *u64x4_to_vals(PyObject *self, PyObject *args) {
    Py_buffer view;
    PyObject *ftype;
    if (!PyArg_ParseTuple(args, "y*O", &view, &ftype)) return NULL;
    if (!PyType_Check(ftype)) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_TypeError, "expected a field class");
        return NULL;
    }
    PyTypeObject *tp = (PyTypeObject *)ftype;
    if (check_rows(&view, 32)) return NULL;
    PyObject *empty = PyTuple_New(0);
    if (!empty) { PyBuffer_Release(&view); return NULL; }
    Py_ssize_t n = view.len / 32;
    PyObject *out = PyList_New(n);
    if (!out) { Py_DECREF(empty); PyBuffer_Release(&view); return NULL; }
    const unsigned char *src = view.buf;
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *v = _PyLong_FromByteArray(src + i * 32, 32, 1, 0);
        PyObject *inst = v ? tp->tp_new(tp, empty, NULL) : NULL;
        int rc = inst ? PyObject_SetAttr(inst, str_value, v) : -1;
        Py_XDECREF(v);
        if (rc < 0) {
            Py_XDECREF(inst);
            Py_DECREF(out);
            Py_DECREF(empty);
            PyBuffer_Release(&view);
            return NULL;
        }
        PyList_SET_ITEM(out, i, inst);
    }
    Py_DECREF(empty);
    PyBuffer_Release(&view);
    return out;
}

/* u64_to_ed_pts(buffer, ptype) -> list of ptype(x, y, z, t)
 * rows of 128 bytes: x,y,z,t each 32 LE bytes */
static PyObject *u64_to_ed_pts(PyObject *self, PyObject *args) {
    Py_buffer view;
    PyObject *ptype;
    if (!PyArg_ParseTuple(args, "y*O", &view, &ptype)) return NULL;
    if (check_rows(&view, 128)) return NULL;
    Py_ssize_t n = view.len / 128;
    PyObject *out = PyList_New(n);
    if (!out) { PyBuffer_Release(&view); return NULL; }
    const unsigned char *src = view.buf;
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *coords[4] = {NULL, NULL, NULL, NULL};
        int ok = 1;
        for (int j = 0; j < 4; j++) {
            coords[j] = _PyLong_FromByteArray(src + i * 128 + j * 32, 32, 1, 0);
            if (!coords[j]) { ok = 0; break; }
        }
        PyObject *p = NULL;
        if (ok)
            p = PyObject_CallFunctionObjArgs(ptype, coords[0], coords[1],
                                             coords[2], coords[3], NULL);
        for (int j = 0; j < 4; j++) Py_XDECREF(coords[j]);
        if (!p) { Py_DECREF(out); PyBuffer_Release(&view); return NULL; }
        PyList_SET_ITEM(out, i, p);
    }
    PyBuffer_Release(&view);
    return out;
}

/* bn_pts_to_u64(seq, ptype) -> bytes (n*96: x,y,z field-element .value,
 * 32 LE bytes each).  None if an element is not an exact ptype instance. */
static PyObject *bn_pts_to_u64(PyObject *self, PyObject *args) {
    PyObject *seq, *ptype;
    if (!PyArg_ParseTuple(args, "OO", &seq, &ptype)) return NULL;
    if (!PyList_CheckExact(seq)) {
        PyErr_SetString(PyExc_TypeError, "expected list");
        return NULL;
    }
    Py_ssize_t n = PyList_GET_SIZE(seq);
    PyObject *names[3];
    names[0] = PyUnicode_InternFromString("x");
    names[1] = PyUnicode_InternFromString("y");
    names[2] = PyUnicode_InternFromString("z");
    PyObject *out =
        names_ok(names, 3) ? PyBytes_FromStringAndSize(NULL, n * 96) : NULL;
    if (!out) goto fail0;
    unsigned char *dst = (unsigned char *)PyBytes_AS_STRING(out);
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *p = PyList_GET_ITEM(seq, i);
        if ((PyObject *)Py_TYPE(p) != ptype) {
            Py_DECREF(out);
            for (int j = 0; j < 3; j++) Py_XDECREF(names[j]);
            Py_RETURN_NONE;
        }
        for (int j = 0; j < 3; j++) {
            PyObject *c = PyObject_GetAttr(p, names[j]);
            if (!c) goto fail;
            PyObject *v = PyObject_GetAttr(c, str_value);
            Py_DECREF(c);
            if (!v) goto fail;
            int rc = long_to_le32(v, dst + i * 96 + j * 32);
            Py_DECREF(v);
            if (rc < 0) goto fail;
        }
    }
    for (int j = 0; j < 3; j++) Py_XDECREF(names[j]);
    return out;
fail:
    Py_DECREF(out);
fail0:
    for (int j = 0; j < 3; j++) Py_XDECREF(names[j]);
    return NULL;
}

/* u64_to_bn_pts(buffer, ptype, ftype) -> list of jacobian points.
 * Rows of 96 bytes (x,y,z, 32 LE bytes each), values ALREADY reduced
 * (the native bn256 kernels' REDC output contract): field elements and
 * points are built via tp_new + slot stores, skipping both __init__s —
 * the per-point hot cost of materializing MSM/batch-exp results. */
static PyObject *u64_to_bn_pts(PyObject *self, PyObject *args) {
    Py_buffer view;
    PyObject *ptype, *ftype;
    if (!PyArg_ParseTuple(args, "y*OO", &view, &ptype, &ftype)) return NULL;
    if (!PyType_Check(ptype) || !PyType_Check(ftype)) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_TypeError, "expected point and field classes");
        return NULL;
    }
    PyTypeObject *ptp = (PyTypeObject *)ptype;
    PyTypeObject *ftp = (PyTypeObject *)ftype;
    if (check_rows(&view, 96)) return NULL;
    PyObject *names[3];
    names[0] = PyUnicode_InternFromString("x");
    names[1] = PyUnicode_InternFromString("y");
    names[2] = PyUnicode_InternFromString("z");
    PyObject *empty = names_ok(names, 3) ? PyTuple_New(0) : NULL;
    PyObject *out = NULL;
    if (!empty) goto fail0;
    Py_ssize_t n = view.len / 96;
    out = PyList_New(n);
    if (!out) goto fail0;
    const unsigned char *src = view.buf;
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *pt = ptp->tp_new(ptp, empty, NULL);
        if (!pt) goto fail;
        for (int j = 0; j < 3; j++) {
            PyObject *v = _PyLong_FromByteArray(src + i * 96 + j * 32,
                                                32, 1, 0);
            PyObject *fe = v ? ftp->tp_new(ftp, empty, NULL) : NULL;
            int rc = fe ? PyObject_SetAttr(fe, str_value, v) : -1;
            Py_XDECREF(v);
            if (rc == 0) rc = PyObject_SetAttr(pt, names[j], fe);
            Py_XDECREF(fe);
            if (rc < 0) { Py_DECREF(pt); goto fail; }
        }
        PyList_SET_ITEM(out, i, pt);
    }
    Py_DECREF(empty);
    PyBuffer_Release(&view);
    for (int j = 0; j < 3; j++) Py_XDECREF(names[j]);
    return out;
fail:
    Py_DECREF(out);
    out = NULL;
fail0:
    Py_XDECREF(empty);
    PyBuffer_Release(&view);
    for (int j = 0; j < 3; j++) Py_XDECREF(names[j]);
    return out;
}

/* bn2_pts_to_u64(seq, ptype) -> bytes (n*192: x,y,z GF(p^2) coords as
 * c0||c1, 32 LE bytes each).  None on a non-ptype element. */
static PyObject *bn2_pts_to_u64(PyObject *self, PyObject *args) {
    PyObject *seq, *ptype;
    if (!PyArg_ParseTuple(args, "OO", &seq, &ptype)) return NULL;
    if (!PyList_CheckExact(seq)) {
        PyErr_SetString(PyExc_TypeError, "expected list");
        return NULL;
    }
    Py_ssize_t n = PyList_GET_SIZE(seq);
    PyObject *names[3];
    names[0] = PyUnicode_InternFromString("x");
    names[1] = PyUnicode_InternFromString("y");
    names[2] = PyUnicode_InternFromString("z");
    PyObject *out =
        names_ok(names, 3) ? PyBytes_FromStringAndSize(NULL, n * 192) : NULL;
    if (!out) goto fail0;
    unsigned char *dst = (unsigned char *)PyBytes_AS_STRING(out);
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *p = PyList_GET_ITEM(seq, i);
        if ((PyObject *)Py_TYPE(p) != ptype) {
            Py_DECREF(out);
            for (int j = 0; j < 3; j++) Py_XDECREF(names[j]);
            Py_RETURN_NONE;
        }
        for (int j = 0; j < 3; j++) {
            PyObject *c = PyObject_GetAttr(p, names[j]);
            if (!c) goto fail;
            PyObject *c0 = PyObject_GetAttr(c, str_c0);
            PyObject *c1 = c0 ? PyObject_GetAttr(c, str_c1) : NULL;
            Py_DECREF(c);
            int rc = c1 ? long_to_le32(c0, dst + i * 192 + j * 64) : -1;
            if (rc == 0)
                rc = long_to_le32(c1, dst + i * 192 + j * 64 + 32);
            Py_XDECREF(c0);
            Py_XDECREF(c1);
            if (rc < 0) goto fail;
        }
    }
    for (int j = 0; j < 3; j++) Py_XDECREF(names[j]);
    return out;
fail:
    Py_DECREF(out);
fail0:
    for (int j = 0; j < 3; j++) Py_XDECREF(names[j]);
    return NULL;
}

/* u64_to_bn2_pts(buffer, ptype, f2type) -> list of twist points.
 * Rows of 192 bytes (x,y,z as c0||c1), values ALREADY reduced; GF(p^2)
 * elements and points built via tp_new + slot stores. */
static PyObject *u64_to_bn2_pts(PyObject *self, PyObject *args) {
    Py_buffer view;
    PyObject *ptype, *f2type;
    if (!PyArg_ParseTuple(args, "y*OO", &view, &ptype, &f2type)) return NULL;
    if (!PyType_Check(ptype) || !PyType_Check(f2type)) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_TypeError, "expected point and field classes");
        return NULL;
    }
    PyTypeObject *ptp = (PyTypeObject *)ptype;
    PyTypeObject *ftp = (PyTypeObject *)f2type;
    if (check_rows(&view, 192)) return NULL;
    PyObject *names[3];
    names[0] = PyUnicode_InternFromString("x");
    names[1] = PyUnicode_InternFromString("y");
    names[2] = PyUnicode_InternFromString("z");
    PyObject *empty = names_ok(names, 3) ? PyTuple_New(0) : NULL;
    PyObject *out = NULL;
    if (!empty) goto fail0;
    Py_ssize_t n = view.len / 192;
    out = PyList_New(n);
    if (!out) goto fail0;
    const unsigned char *src = view.buf;
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *pt = ptp->tp_new(ptp, empty, NULL);
        if (!pt) goto fail;
        for (int j = 0; j < 3; j++) {
            PyObject *c0 = _PyLong_FromByteArray(src + i * 192 + j * 64,
                                                 32, 1, 0);
            PyObject *c1 = c0 ? _PyLong_FromByteArray(
                                    src + i * 192 + j * 64 + 32, 32, 1, 0)
                              : NULL;
            PyObject *fe = c1 ? ftp->tp_new(ftp, empty, NULL) : NULL;
            int rc = fe ? PyObject_SetAttr(fe, str_c0, c0) : -1;
            if (rc == 0) rc = PyObject_SetAttr(fe, str_c1, c1);
            Py_XDECREF(c0);
            Py_XDECREF(c1);
            if (rc == 0) rc = PyObject_SetAttr(pt, names[j], fe);
            Py_XDECREF(fe);
            if (rc < 0) { Py_DECREF(pt); goto fail; }
        }
        PyList_SET_ITEM(out, i, pt);
    }
    Py_DECREF(empty);
    PyBuffer_Release(&view);
    for (int j = 0; j < 3; j++) Py_XDECREF(names[j]);
    return out;
fail:
    Py_DECREF(out);
    out = NULL;
fail0:
    Py_XDECREF(empty);
    PyBuffer_Release(&view);
    for (int j = 0; j < 3; j++) Py_XDECREF(names[j]);
    return out;
}

/* --------------------------------------------------------- circuit gates */

/* T_STR(0x02) + u32be(len) + utf8 bytes; v must be an exact str.
 * Returns 1 (unsupported -> Python fallback, which raises in struct.pack)
 * for strings whose utf8 length does not fit the u32 length field, instead
 * of silently truncating it. */
static int write_str_record(Buf *b, PyObject *s) {
    Py_ssize_t len;
    const char *utf8 = PyUnicode_AsUTF8AndSize(s, &len);
    if (!utf8) return -1;
    if ((unsigned long long)len > 0xFFFFFFFFULL) return 1;
    unsigned char *dst = buf_reserve(b, 5 + len);
    if (!dst) return -1;
    dst[0] = 0x02; /* T_STR */
    dst[1] = (unsigned char)(len >> 24);
    dst[2] = (unsigned char)(len >> 16);
    dst[3] = (unsigned char)(len >> 8);
    dst[4] = (unsigned char)len;
    memcpy(dst + 5, utf8, len);
    b->len += 5 + len;
    return 0;
}

/* One gate atom, matching serialization._encode's enc_atom exactly:
 * CircuitVar -> its .name first, then exact str -> T_STR record, exact
 * int (bool excluded, as in Python's `type(v) is int`) -> T_INT record.
 * Returns 0 written, 1 unsupported (caller falls back for the whole
 * circuit), -1 error. */
static int write_atom(Buf *b, PyObject *v, PyObject *cvar_type,
                      PyObject *s_name) {
    PyObject *tmp = NULL;
    int isvar = PyObject_IsInstance(v, cvar_type);
    if (isvar < 0) return -1;
    if (isvar) {
        tmp = PyObject_GetAttr(v, s_name);
        if (!tmp) return -1;
        v = tmp;
    }
    int rc;
    if (PyUnicode_CheckExact(v)) {
        rc = write_str_record(b, v);
    } else if (PyLong_CheckExact(v)) {
        unsigned char *tag = buf_reserve(b, 1);
        if (!tag) {
            rc = -1;
        } else {
            *tag = 0x01; /* T_INT */
            b->len += 1;
            rc = write_int_record(b, v);
        }
    } else {
        rc = 1; /* exotic constant: whole-circuit Python fallback */
    }
    Py_XDECREF(tmp);
    return rc;
}

/* encode_gates(gates, cvar_type) -> bytes | None
 *
 * The per-gate body of the T_CIRCUIT structural encoding
 * (serialization._encode, Circuit branch): for every gate, a T_STR record
 * of g.op, the output atom, u32be(len(g.inputs)), then each input atom.
 * BYTE-IDENTICAL to the Python loop (pinned by the golden-transcript
 * tests).  Returns None when any op is a non-str or any atom is neither
 * str/int/CircuitVar-named-by-str — the caller falls back wholesale. */
static PyObject *encode_gates(PyObject *self, PyObject *args) {
    PyObject *gates, *cvar_type;
    if (!PyArg_ParseTuple(args, "OO", &gates, &cvar_type)) return NULL;
    if (!PyList_CheckExact(gates)) {
        PyErr_SetString(PyExc_TypeError, "expected list of gates");
        return NULL;
    }
    PyObject *names[4];
    names[0] = PyUnicode_InternFromString("op");
    names[1] = PyUnicode_InternFromString("output");
    names[2] = PyUnicode_InternFromString("inputs");
    names[3] = PyUnicode_InternFromString("name");
    if (!names_ok(names, 4)) {
        for (int j = 0; j < 4; j++) Py_XDECREF(names[j]);
        return NULL;
    }
    Py_ssize_t n = PyList_GET_SIZE(gates);
    /* Gate.op is an `op` Enum member in the builder DSL (never a plain
     * str): mirror the Python path's str(g.op), cached per distinct op
     * object (enum members are singletons, so identity keys suffice). */
    PyObject *op_keys[8], *op_strs[8];
    int n_op_cache = 0;
    Buf b;
    if (buf_init(&b, 64 + n * 48)) {
        for (int j = 0; j < 4; j++) Py_DECREF(names[j]);
        return PyErr_NoMemory();
    }
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *g = PyList_GET_ITEM(gates, i);
        int rc;
        PyObject *op = PyObject_GetAttr(g, names[0]);
        if (!op) goto fail;
        PyObject *ops = NULL;
        if (PyUnicode_CheckExact(op)) {
            ops = op;
            Py_INCREF(ops);
        } else {
            for (int j = 0; j < n_op_cache; j++) {
                if (op_keys[j] == op) {
                    ops = op_strs[j];
                    Py_INCREF(ops);
                    break;
                }
            }
            if (!ops) {
                ops = PyObject_Str(op);
                if (!ops) {
                    Py_DECREF(op);
                    goto fail;
                }
                if (!PyUnicode_CheckExact(ops)) {
                    Py_DECREF(ops);
                    Py_DECREF(op);
                    rc = 1;
                    goto out_rc;
                }
                if (n_op_cache < 8) {
                    Py_INCREF(op);
                    Py_INCREF(ops);
                    op_keys[n_op_cache] = op;
                    op_strs[n_op_cache] = ops;
                    n_op_cache++;
                }
            }
        }
        rc = write_str_record(&b, ops);
        Py_DECREF(ops);
        Py_DECREF(op);
        if (rc) goto out_rc;
        PyObject *out_v = PyObject_GetAttr(g, names[1]);
        if (!out_v) goto fail;
        rc = write_atom(&b, out_v, cvar_type, names[3]);
        Py_DECREF(out_v);
        if (rc) goto out_rc;
        PyObject *ins = PyObject_GetAttr(g, names[2]);
        if (!ins) goto fail;
        PyObject **items;
        Py_ssize_t ni;
        if (PyList_CheckExact(ins)) {
            items = ((PyListObject *)ins)->ob_item;
            ni = PyList_GET_SIZE(ins);
        } else if (PyTuple_CheckExact(ins)) {
            items = ((PyTupleObject *)ins)->ob_item;
            ni = PyTuple_GET_SIZE(ins);
        } else {
            Py_DECREF(ins);
            rc = 1;
            goto out_rc;
        }
        unsigned char *dst = buf_reserve(&b, 4);
        if (!dst) {
            Py_DECREF(ins);
            goto fail;
        }
        dst[0] = (unsigned char)(ni >> 24);
        dst[1] = (unsigned char)(ni >> 16);
        dst[2] = (unsigned char)(ni >> 8);
        dst[3] = (unsigned char)ni;
        b.len += 4;
        rc = 0;
        for (Py_ssize_t k = 0; k < ni && rc == 0; k++)
            rc = write_atom(&b, items[k], cvar_type, names[3]);
        Py_DECREF(ins);
        if (rc) goto out_rc;
        continue;
    out_rc:
        if (rc < 0) goto fail;
        /* rc == 1: unsupported shape -> Python fallback */
        buf_free(&b);
        for (int j = 0; j < n_op_cache; j++) {
            Py_DECREF(op_keys[j]);
            Py_DECREF(op_strs[j]);
        }
        for (int j = 0; j < 4; j++) Py_DECREF(names[j]);
        Py_RETURN_NONE;
    }
    {
        PyObject *out = PyBytes_FromStringAndSize((char *)b.data, b.len);
        buf_free(&b);
        for (int j = 0; j < n_op_cache; j++) {
            Py_DECREF(op_keys[j]);
            Py_DECREF(op_strs[j]);
        }
        for (int j = 0; j < 4; j++) Py_DECREF(names[j]);
        return out;
    }
fail:
    buf_free(&b);
    for (int j = 0; j < n_op_cache; j++) {
        Py_DECREF(op_keys[j]);
        Py_DECREF(op_strs[j]);
    }
    for (int j = 0; j < 4; j++) Py_DECREF(names[j]);
    return NULL;
}

/* ---------------------------------------------------------------- module */

static PyMethodDef methods[] = {
    {"encode_vals", encode_vals, METH_VARARGS,
     "Transcript T_INT records for a list of ints / field elements."},
    {"encode_ed_points", encode_ed_points, METH_VARARGS,
     "Transcript T_ED records for a list of Edwards points."},
    {"encode_bn_points", encode_bn_points, METH_VARARGS,
     "Transcript T_BN records for a list of BN G1 points."},
    {"vals_to_u64x4", vals_to_u64x4, METH_VARARGS,
     "ints/field elements -> 32-byte little-endian rows."},
    {"ed_pts_to_u64", ed_pts_to_u64, METH_VARARGS,
     "Edwards points -> 128-byte rows (x,y,z,t)."},
    {"u64x4_to_ints", u64x4_to_ints, METH_VARARGS,
     "32-byte little-endian rows -> list of ints."},
    {"u64x4_to_vals", u64x4_to_vals, METH_VARARGS,
     "reduced 32-byte rows -> list of field elements (skips __init__)."},
    {"u64_to_ed_pts", u64_to_ed_pts, METH_VARARGS,
     "128-byte rows -> list of Edwards points."},
    {"bn_pts_to_u64", bn_pts_to_u64, METH_VARARGS,
     "BN G1 jacobian points -> 96-byte rows (x,y,z values)."},
    {"u64_to_bn_pts", u64_to_bn_pts, METH_VARARGS,
     "96-byte reduced rows -> list of BN G1 points (skips __init__)."},
    {"bn2_pts_to_u64", bn2_pts_to_u64, METH_VARARGS,
     "BN twist points -> 192-byte rows (x,y,z as c0||c1)."},
    {"u64_to_bn2_pts", u64_to_bn2_pts, METH_VARARGS,
     "192-byte reduced rows -> list of BN twist points (skips __init__)."},
    {"encode_gates", encode_gates, METH_VARARGS,
     "Per-gate body of the T_CIRCUIT structural transcript encoding."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fastser", NULL, -1, methods,
};

PyMODINIT_FUNC PyInit__fastser(void) {
    str_value = PyUnicode_InternFromString("value");
    str_c0 = PyUnicode_InternFromString("c0");
    str_c1 = PyUnicode_InternFromString("c1");
    if (!str_value || !str_c0 || !str_c1) return NULL;
    return PyModule_Create(&moduledef);
}
