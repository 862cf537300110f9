/* fastops — native host-side kernels for the data/serving pipeline.
 *
 * The reference delegates its host-side native work to torch DataLoader
 * C++ workers and pinned-memory collation; this module is the framework's
 * first-party equivalent for the per-batch hot paths:
 *
 *   pack_f32:    uint8 NHWC batch -> flat float32 (optionally scaled by
 *                1/255), OpenMP-parallel over images. Replaces the
 *                ascontiguousarray + astype + divide numpy chain in the
 *                trainer's host loop.
 *   pack_planar: uint8 NHWC -> planar NCHW uint8 (HWC de-interleave),
 *                OpenMP-parallel. Feeds the planar device-transfer path.
 *   greedy_nms:  exact reference greedy suppression on the host (used as
 *                a CPU fallback and as an independent oracle in tests).
 *
 * Pure CPython C API (no pybind11 in the image); built by native/__init__.py
 * with gcc -O3 -fopenmp at first import, with a numpy fallback.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

#ifdef _OPENMP
#include <omp.h>
#endif

static int get_buffer(PyObject *obj, Py_buffer *view, int writable) {
    int flags = PyBUF_C_CONTIGUOUS | (writable ? PyBUF_WRITABLE : 0);
    if (PyObject_GetBuffer(obj, view, flags) != 0) return -1;
    return 0;
}

/* pack_f32(src_u8, dst_f32, scale) — src [B, N] bytes, dst [B, N] f32 */
static PyObject *pack_f32(PyObject *self, PyObject *args) {
    PyObject *src_obj, *dst_obj;
    double scale;
    if (!PyArg_ParseTuple(args, "OOd", &src_obj, &dst_obj, &scale))
        return NULL;
    Py_buffer src, dst;
    if (get_buffer(src_obj, &src, 0) != 0) return NULL;
    if (get_buffer(dst_obj, &dst, 1) != 0) { PyBuffer_Release(&src); return NULL; }
    Py_ssize_t n = src.len;
    if (dst.len != n * (Py_ssize_t)sizeof(float)) {
        PyBuffer_Release(&src); PyBuffer_Release(&dst);
        PyErr_SetString(PyExc_ValueError, "dst must be float32 with src's element count");
        return NULL;
    }
    const uint8_t *s = (const uint8_t *)src.buf;
    float *d = (float *)dst.buf;
    const float k = (float)scale;
    Py_BEGIN_ALLOW_THREADS
    #pragma omp parallel for schedule(static)
    for (Py_ssize_t i = 0; i < n; i++) d[i] = (float)s[i] * k;
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&src); PyBuffer_Release(&dst);
    Py_RETURN_NONE;
}

/* pack_planar(src_u8 [B,H,W,3], dst_u8 [B,3,H,W], B, H, W) */
static PyObject *pack_planar(PyObject *self, PyObject *args) {
    PyObject *src_obj, *dst_obj;
    Py_ssize_t B, H, W;
    if (!PyArg_ParseTuple(args, "OOnnn", &src_obj, &dst_obj, &B, &H, &W))
        return NULL;
    Py_buffer src, dst;
    if (get_buffer(src_obj, &src, 0) != 0) return NULL;
    if (get_buffer(dst_obj, &dst, 1) != 0) { PyBuffer_Release(&src); return NULL; }
    if (src.len != B * H * W * 3 || dst.len != src.len) {
        PyBuffer_Release(&src); PyBuffer_Release(&dst);
        PyErr_SetString(PyExc_ValueError, "shape mismatch");
        return NULL;
    }
    const uint8_t *s = (const uint8_t *)src.buf;
    uint8_t *d = (uint8_t *)dst.buf;
    Py_BEGIN_ALLOW_THREADS
    #pragma omp parallel for collapse(2) schedule(static)
    for (Py_ssize_t b = 0; b < B; b++) {
        for (Py_ssize_t y = 0; y < H; y++) {
            const uint8_t *row = s + ((b * H + y) * W) * 3;
            uint8_t *r0 = d + b * 3 * H * W + 0 * H * W + y * W;
            uint8_t *r1 = d + b * 3 * H * W + 1 * H * W + y * W;
            uint8_t *r2 = d + b * 3 * H * W + 2 * H * W + y * W;
            for (Py_ssize_t x = 0; x < W; x++) {
                r0[x] = row[3 * x + 0];
                r1[x] = row[3 * x + 1];
                r2[x] = row[3 * x + 2];
            }
        }
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&src); PyBuffer_Release(&dst);
    Py_RETURN_NONE;
}

/* greedy_nms(boxes_f32 [K,4] xyxy score-sorted, valid_u8 [K], thresh,
 *            keep_u8 [K] out) — suppression at IoU >= thresh by kept
 * higher-ranked boxes (reference yolo/util/utils.py:32-89 semantics). */
static PyObject *greedy_nms(PyObject *self, PyObject *args) {
    PyObject *boxes_obj, *valid_obj, *keep_obj;
    double thresh;
    if (!PyArg_ParseTuple(args, "OOdO", &boxes_obj, &valid_obj, &thresh, &keep_obj))
        return NULL;
    Py_buffer boxes, valid, keep;
    if (get_buffer(boxes_obj, &boxes, 0) != 0) return NULL;
    if (get_buffer(valid_obj, &valid, 0) != 0) { PyBuffer_Release(&boxes); return NULL; }
    if (get_buffer(keep_obj, &keep, 1) != 0) {
        PyBuffer_Release(&boxes); PyBuffer_Release(&valid); return NULL;
    }
    Py_ssize_t K = valid.len;
    if (boxes.len != K * 4 * (Py_ssize_t)sizeof(float) || keep.len != K) {
        PyBuffer_Release(&boxes); PyBuffer_Release(&valid); PyBuffer_Release(&keep);
        PyErr_SetString(PyExc_ValueError, "shape mismatch");
        return NULL;
    }
    const float *bx = (const float *)boxes.buf;
    const uint8_t *vd = (const uint8_t *)valid.buf;
    uint8_t *kp = (uint8_t *)keep.buf;
    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t i = 0; i < K; i++) kp[i] = vd[i] ? 1 : 0;
    for (Py_ssize_t i = 0; i < K; i++) {
        if (!kp[i]) continue;
        const float x1 = bx[4 * i], y1 = bx[4 * i + 1];
        const float x2 = bx[4 * i + 2], y2 = bx[4 * i + 3];
        const float ai = (x2 - x1) * (y2 - y1);
        #pragma omp parallel for schedule(static)
        for (Py_ssize_t j = i + 1; j < K; j++) {
            if (!kp[j]) continue;
            const float tx = bx[4 * j] > x1 ? bx[4 * j] : x1;
            const float ty = bx[4 * j + 1] > y1 ? bx[4 * j + 1] : y1;
            const float bx2 = bx[4 * j + 2] < x2 ? bx[4 * j + 2] : x2;
            const float by2 = bx[4 * j + 3] < y2 ? bx[4 * j + 3] : y2;
            if (tx >= bx2 || ty >= by2) continue;
            const float inter = (bx2 - tx) * (by2 - ty);
            const float aj = (bx[4 * j + 2] - bx[4 * j]) * (bx[4 * j + 3] - bx[4 * j + 1]);
            const float uni = ai + aj - inter;
            if (uni > 0 && inter / uni >= (float)thresh) kp[j] = 0;
        }
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&boxes); PyBuffer_Release(&valid); PyBuffer_Release(&keep);
    Py_RETURN_NONE;
}

static PyMethodDef Methods[] = {
    {"pack_f32", pack_f32, METH_VARARGS, "uint8 -> float32 * scale"},
    {"pack_planar", pack_planar, METH_VARARGS, "NHWC u8 -> NCHW u8"},
    {"greedy_nms", greedy_nms, METH_VARARGS, "host greedy NMS"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_fastops", "native host pipeline kernels",
    -1, Methods,
};

PyMODINIT_FUNC PyInit__fastops(void) { return PyModule_Create(&module); }
