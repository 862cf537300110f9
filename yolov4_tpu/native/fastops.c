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
 *   coco_match:  COCOeval greedy detection<->gt matching (the pycocotools
 *                evaluateImg inner loops) batched over all images of one
 *                (category, area-range); the eval-time host hot loop.
 *
 * Pure CPython C API (no pybind11 in the image); built by native/__init__.py
 * with gcc -O3 -fopenmp at first import, with a numpy fallback.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <stdlib.h>
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

/* pack_s2d(src [B,H,W,3], dst [B,H/2,W/2,12], B, H, W, elem_size)
 * NHWC -> space-to-depth wire layout: dst channel (dy*2+dx)*3+c holds
 * src pixel (2*y2+dy, 2*x2+dx, c). This is exactly the layout the s2d
 * stem consumes ([B,H/2,W/2,12], models/layers.space_to_depth order),
 * so the device program skips the 3-channel relayout copies the planar
 * upload paid (~1.3-2.5 ms/batch measured in the fwd/train traces).
 * Element-type agnostic (elem_size = 1 for uint8, 4 for float32): each
 * output 12-vector is two contiguous 2-pixel row segments. */
static PyObject *pack_s2d(PyObject *self, PyObject *args) {
    PyObject *src_obj, *dst_obj;
    Py_ssize_t B, H, W, E;
    if (!PyArg_ParseTuple(args, "OOnnnn", &src_obj, &dst_obj, &B, &H, &W, &E))
        return NULL;
    Py_buffer src, dst;
    if (get_buffer(src_obj, &src, 0) != 0) return NULL;
    if (get_buffer(dst_obj, &dst, 1) != 0) { PyBuffer_Release(&src); return NULL; }
    if (src.len != B * H * W * 3 * E || dst.len != src.len
            || (H & 1) || (W & 1) || E <= 0) {
        PyBuffer_Release(&src); PyBuffer_Release(&dst);
        PyErr_SetString(PyExc_ValueError, "shape mismatch or odd dims");
        return NULL;
    }
    const uint8_t *s = (const uint8_t *)src.buf;
    uint8_t *d = (uint8_t *)dst.buf;
    Py_ssize_t H2 = H / 2, W2 = W / 2, seg = 6 * E;
    Py_BEGIN_ALLOW_THREADS
    #pragma omp parallel for collapse(2) schedule(static)
    for (Py_ssize_t b = 0; b < B; b++) {
        for (Py_ssize_t y2 = 0; y2 < H2; y2++) {
            const uint8_t *r0 = s + ((b * H + 2 * y2) * W) * 3 * E;
            const uint8_t *r1 = r0 + W * 3 * E;
            uint8_t *o = d + ((b * H2 + y2) * W2) * 12 * E;
            for (Py_ssize_t x2 = 0; x2 < W2; x2++) {
                memcpy(o, r0 + seg * x2, seg);
                memcpy(o + seg, r1 + seg * x2, seg);
                o += 2 * seg;
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

/* coco_match(ious_f64, g_ignore_u8, iscrowd_u8, d_outside_u8,
 *            nd_i64, ng_i64, thrs_f64, matched_u8_out, ignored_u8_out)
 *
 * COCOeval greedy matching (pycocotools cocoeval.evaluateImg lines 258-282
 * semantics) for all images of one (category, area-range) in one call:
 *   ious      concatenated per-image [D_i, G_i] IoU blocks, dt rows in
 *             descending-score order, gt columns in ORIGINAL ann order
 *   g_ignore  per-gt ignore flag (ann ignore/iscrowd OR area outside range)
 *   iscrowd   per-gt crowd flag (crowd gts may match many detections)
 *   d_outside per-dt "area outside range" flag
 *   nd/ng     per-image detection / gt counts (int64, len = n_images)
 *   thrs      IoU thresholds [T]
 *   matched   out [T, sum(nd)] u8 — detection matched some gt
 *   ignored   out [T, sum(nd)] u8 — matched an ignored gt, or unmatched+outside
 *
 * Within each image the gts are scanned non-ignored-first (stable), a
 * detection takes the available gt with the highest IoU >= thr (ties go to
 * the later gt, matching the reference scan-update order), and the scan
 * stops at the first ignored gt once a non-ignored match is held.
 */
static PyObject *coco_match(PyObject *self, PyObject *args) {
    PyObject *ious_o, *gig_o, *crowd_o, *dout_o, *nd_o, *ng_o, *thrs_o,
             *matched_o, *ignored_o;
    if (!PyArg_ParseTuple(args, "OOOOOOOOO", &ious_o, &gig_o, &crowd_o,
                          &dout_o, &nd_o, &ng_o, &thrs_o, &matched_o,
                          &ignored_o))
        return NULL;
    Py_buffer ious, gig, crowd, dout, nd, ng, thrs, matched, ignored;
    if (get_buffer(ious_o, &ious, 0) != 0) return NULL;
    if (get_buffer(gig_o, &gig, 0) != 0) goto fail1;
    if (get_buffer(crowd_o, &crowd, 0) != 0) goto fail2;
    if (get_buffer(dout_o, &dout, 0) != 0) goto fail3;
    if (get_buffer(nd_o, &nd, 0) != 0) goto fail4;
    if (get_buffer(ng_o, &ng, 0) != 0) goto fail5;
    if (get_buffer(thrs_o, &thrs, 0) != 0) goto fail6;
    if (get_buffer(matched_o, &matched, 1) != 0) goto fail7;
    if (get_buffer(ignored_o, &ignored, 1) != 0) goto fail8;
    {
        const Py_ssize_t n_img = nd.len / (Py_ssize_t)sizeof(int64_t);
        const Py_ssize_t T = thrs.len / (Py_ssize_t)sizeof(double);
        const int64_t *ndp = (const int64_t *)nd.buf;
        const int64_t *ngp = (const int64_t *)ng.buf;
        const double *iou_all = (const double *)ious.buf;
        const uint8_t *gig_all = (const uint8_t *)gig.buf;
        const uint8_t *crowd_all = (const uint8_t *)crowd.buf;
        const uint8_t *dout_all = (const uint8_t *)dout.buf;
        const double *th = (const double *)thrs.buf;
        uint8_t *m_out = (uint8_t *)matched.buf;
        uint8_t *i_out = (uint8_t *)ignored.buf;

        int64_t total_d = 0, total_g = 0, total_iou = 0;
        for (Py_ssize_t i = 0; i < n_img; i++) {
            total_d += ndp[i];
            total_g += ngp[i];
            total_iou += ndp[i] * ngp[i];
        }
        if (gig.len != total_g || crowd.len != total_g || dout.len != total_d ||
            ious.len != total_iou * (Py_ssize_t)sizeof(double) ||
            matched.len != T * total_d || ignored.len != T * total_d ||
            ng.len != n_img * (Py_ssize_t)sizeof(int64_t)) {
            PyBuffer_Release(&ignored); PyBuffer_Release(&matched);
            PyBuffer_Release(&thrs); PyBuffer_Release(&ng); PyBuffer_Release(&nd);
            PyBuffer_Release(&dout); PyBuffer_Release(&crowd);
            PyBuffer_Release(&gig); PyBuffer_Release(&ious);
            PyErr_SetString(PyExc_ValueError, "coco_match: shape mismatch");
            return NULL;
        }

        int64_t *ioff = (int64_t *)malloc(3 * (size_t)(n_img + 1) * sizeof(int64_t));
        int64_t *goff = ioff + (n_img + 1);
        int64_t *doff = goff + (n_img + 1);
        ioff[0] = goff[0] = doff[0] = 0;
        for (Py_ssize_t i = 0; i < n_img; i++) {
            ioff[i + 1] = ioff[i] + ndp[i] * ngp[i];
            goff[i + 1] = goff[i] + ngp[i];
            doff[i + 1] = doff[i] + ndp[i];
        }
        memset(m_out, 0, (size_t)(T * total_d));
        memset(i_out, 0, (size_t)(T * total_d));

        int bad_alloc = 0;
        Py_BEGIN_ALLOW_THREADS
        #pragma omp parallel for schedule(dynamic, 16)
        for (Py_ssize_t i = 0; i < n_img; i++) {
            const int64_t D = ndp[i], G = ngp[i];
            if (D == 0) continue;
            const double *iou = iou_all + ioff[i];
            const uint8_t *gg = gig_all + goff[i];
            const uint8_t *cr = crowd_all + goff[i];
            const uint8_t *do_ = dout_all + doff[i];
            if (G == 0) {  /* no gts: every dt unmatched; outside => ignored */
                for (Py_ssize_t t = 0; t < T; t++) {
                    uint8_t *ir = i_out + (size_t)t * total_d + doff[i];
                    for (int64_t d = 0; d < D; d++) ir[d] = do_[d];
                }
                continue;
            }
            int64_t *ord = (int64_t *)malloc((size_t)G * (sizeof(int64_t) + 1));
            if (!ord) { bad_alloc = 1; continue; }
            uint8_t *taken = (uint8_t *)(ord + G);
            int64_t k = 0;  /* stable: non-ignored gts first */
            for (int64_t g = 0; g < G; g++) if (!gg[g]) ord[k++] = g;
            for (int64_t g = 0; g < G; g++) if (gg[g]) ord[k++] = g;

            for (Py_ssize_t t = 0; t < T; t++) {
                const double thr = th[t] < 1.0 - 1e-10 ? th[t] : 1.0 - 1e-10;
                uint8_t *mr = m_out + (size_t)t * total_d + doff[i];
                uint8_t *ir = i_out + (size_t)t * total_d + doff[i];
                memset(taken, 0, (size_t)G);
                for (int64_t d = 0; d < D; d++) {
                    const double *row = iou + d * G;
                    double best = thr;
                    int64_t m = -1;
                    uint8_t m_ig = 0;
                    for (int64_t gi = 0; gi < G; gi++) {
                        const int64_t g = ord[gi];
                        if (taken[g] && !cr[g]) continue;
                        if (m > -1 && m_ig == 0 && gg[g]) break;
                        const double v = row[g];
                        if (v < best) continue;
                        best = v;
                        m = g;
                        m_ig = gg[g];
                    }
                    if (m < 0) { ir[d] = do_[d]; continue; }
                    mr[d] = 1;
                    ir[d] = m_ig;
                    taken[m] = 1;
                }
            }
            free(ord);
        }
        Py_END_ALLOW_THREADS
        free(ioff);
        if (bad_alloc) {
            PyBuffer_Release(&ignored); PyBuffer_Release(&matched);
            PyBuffer_Release(&thrs); PyBuffer_Release(&ng); PyBuffer_Release(&nd);
            PyBuffer_Release(&dout); PyBuffer_Release(&crowd);
            PyBuffer_Release(&gig); PyBuffer_Release(&ious);
            return PyErr_NoMemory();
        }
    }
    PyBuffer_Release(&ignored); PyBuffer_Release(&matched);
    PyBuffer_Release(&thrs); PyBuffer_Release(&ng); PyBuffer_Release(&nd);
    PyBuffer_Release(&dout); PyBuffer_Release(&crowd);
    PyBuffer_Release(&gig); PyBuffer_Release(&ious);
    Py_RETURN_NONE;
fail8: PyBuffer_Release(&matched);
fail7: PyBuffer_Release(&thrs);
fail6: PyBuffer_Release(&ng);
fail5: PyBuffer_Release(&nd);
fail4: PyBuffer_Release(&dout);
fail3: PyBuffer_Release(&crowd);
fail2: PyBuffer_Release(&gig);
fail1: PyBuffer_Release(&ious);
    return NULL;
}

static PyMethodDef Methods[] = {
    {"pack_f32", pack_f32, METH_VARARGS, "uint8 -> float32 * scale"},
    {"pack_planar", pack_planar, METH_VARARGS, "NHWC u8 -> NCHW u8"},
    {"pack_s2d", pack_s2d, METH_VARARGS, "NHWC u8 -> s2d wire u8"},
    {"greedy_nms", greedy_nms, METH_VARARGS, "host greedy NMS"},
    {"coco_match", coco_match, METH_VARARGS, "batched COCOeval matching"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_fastops", "native host pipeline kernels",
    -1, Methods,
};

PyMODINIT_FUNC PyInit__fastops(void) { return PyModule_Create(&module); }
