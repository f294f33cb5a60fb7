// framepack — host-side native helpers for the media pipeline.
//
// The reference's host-side pixel work lives in third-party C++ (OpenCV:
// decode, resize, rectangle/putText — server/model.py:23,57,67-74).  Decode
// and encode stay on FFmpeg/OpenCV here too (TPUs have no video ASIC), but
// the glue that would otherwise be per-frame Python — packing sampled frames
// into the pinned device-batch buffer, channel swizzles, and box drawing on
// the annotated output — is this first-party extension.  Everything releases
// the GIL so it overlaps the decode thread on a single-core host.
//
// Built with scripts/build_native.sh (setuptools); truely_tpu.media.native
// loads it when present and falls back to numpy/cv2 otherwise.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct BufferGuard {
    Py_buffer view{};
    bool held = false;
    ~BufferGuard() {
        if (held) PyBuffer_Release(&view);
    }
};

bool get_buffer(PyObject* obj, BufferGuard* guard, int flags, const char* name) {
    if (PyObject_GetBuffer(obj, &guard->view, flags) != 0) {
        PyErr_Format(PyExc_TypeError, "%s must support the buffer protocol", name);
        return false;
    }
    guard->held = true;
    return true;
}

// pack_frames(dst, frames, offsets) -> None
//
// dst:     writable contiguous uint8 buffer of shape (B, H, W, 3) (flat ok)
// frames:  sequence of contiguous uint8 buffers, each H*W*3 bytes
// offsets: sequence of destination row indices (int), len == len(frames)
PyObject* pack_frames(PyObject*, PyObject* args) {
    PyObject* dst_obj;
    PyObject* frames_obj;
    PyObject* offsets_obj;
    if (!PyArg_ParseTuple(args, "OOO", &dst_obj, &frames_obj, &offsets_obj)) {
        return nullptr;
    }
    BufferGuard dst;
    if (!get_buffer(dst_obj, &dst, PyBUF_WRITABLE | PyBUF_C_CONTIGUOUS, "dst")) {
        return nullptr;
    }
    PyObject* frames_seq = PySequence_Fast(frames_obj, "frames must be a sequence");
    if (!frames_seq) return nullptr;
    PyObject* offsets_seq = PySequence_Fast(offsets_obj, "offsets must be a sequence");
    if (!offsets_seq) {
        Py_DECREF(frames_seq);
        return nullptr;
    }
    Py_ssize_t n = PySequence_Fast_GET_SIZE(frames_seq);
    if (PySequence_Fast_GET_SIZE(offsets_seq) != n) {
        Py_DECREF(frames_seq);
        Py_DECREF(offsets_seq);
        PyErr_SetString(PyExc_ValueError, "frames and offsets length mismatch");
        return nullptr;
    }

    // Collect source buffers + offsets up front (needs the GIL).
    struct Src { const uint8_t* data; Py_ssize_t len; Py_ssize_t offset; };
    std::vector<BufferGuard> guards(n);
    std::vector<Src> srcs(n);
    Py_ssize_t frame_bytes = -1;
    for (Py_ssize_t i = 0; i < n; ++i) {
        PyObject* item = PySequence_Fast_GET_ITEM(frames_seq, i);
        if (!get_buffer(item, &guards[i], PyBUF_C_CONTIGUOUS, "frame")) {
            Py_DECREF(frames_seq);
            Py_DECREF(offsets_seq);
            return nullptr;
        }
        long off = PyLong_AsLong(PySequence_Fast_GET_ITEM(offsets_seq, i));
        if (off == -1 && PyErr_Occurred()) {
            Py_DECREF(frames_seq);
            Py_DECREF(offsets_seq);
            return nullptr;
        }
        if (frame_bytes < 0) frame_bytes = guards[i].view.len;
        if (guards[i].view.len != frame_bytes) {
            Py_DECREF(frames_seq);
            Py_DECREF(offsets_seq);
            PyErr_SetString(PyExc_ValueError, "frames must all be the same size");
            return nullptr;
        }
        srcs[i] = {static_cast<const uint8_t*>(guards[i].view.buf),
                   guards[i].view.len, static_cast<Py_ssize_t>(off)};
        if ((srcs[i].offset + 1) * frame_bytes > dst.view.len || off < 0) {
            Py_DECREF(frames_seq);
            Py_DECREF(offsets_seq);
            PyErr_SetString(PyExc_ValueError, "offset out of range for dst");
            return nullptr;
        }
    }
    uint8_t* out = static_cast<uint8_t*>(dst.view.buf);
    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t i = 0; i < n; ++i) {
        std::memcpy(out + srcs[i].offset * frame_bytes, srcs[i].data, frame_bytes);
    }
    Py_END_ALLOW_THREADS
    Py_DECREF(frames_seq);
    Py_DECREF(offsets_seq);
    Py_RETURN_NONE;
}

// draw_rect(frame, h, w, x1, y1, x2, y2, b, g, r, thickness) -> None
// Draws an axis-aligned rectangle outline on an HxWx3 uint8 BGR frame,
// clamped to the image (cv2.rectangle-compatible for in-bounds boxes).
PyObject* draw_rect(PyObject*, PyObject* args) {
    PyObject* frame_obj;
    long h, w, x1, y1, x2, y2, b, g, r, thickness;
    if (!PyArg_ParseTuple(args, "Ollllllllll", &frame_obj, &h, &w,
                          &x1, &y1, &x2, &y2, &b, &g, &r, &thickness)) {
        return nullptr;
    }
    BufferGuard buf;
    if (!get_buffer(frame_obj, &buf, PyBUF_WRITABLE | PyBUF_C_CONTIGUOUS, "frame")) {
        return nullptr;
    }
    if (buf.view.len < static_cast<Py_ssize_t>(h) * w * 3) {
        PyErr_SetString(PyExc_ValueError, "frame buffer smaller than h*w*3");
        return nullptr;
    }
    uint8_t* px = static_cast<uint8_t*>(buf.view.buf);
    const uint8_t color[3] = {static_cast<uint8_t>(b), static_cast<uint8_t>(g),
                              static_cast<uint8_t>(r)};
    Py_BEGIN_ALLOW_THREADS
    auto put = [&](long y, long x) {
        if (y < 0 || y >= h || x < 0 || x >= w) return;
        uint8_t* p = px + (y * w + x) * 3;
        p[0] = color[0]; p[1] = color[1]; p[2] = color[2];
    };
    for (long t = 0; t < thickness; ++t) {
        // expand outward like cv2 (half in, half out of the nominal edge)
        long o = t - thickness / 2;
        for (long x = x1 - o; x <= x2 + o; ++x) {
            put(y1 - o, x);
            put(y2 + o, x);
        }
        for (long y = y1 - o; y <= y2 + o; ++y) {
            put(y, x1 - o);
            put(y, x2 + o);
        }
    }
    Py_END_ALLOW_THREADS
    Py_RETURN_NONE;
}

// bgr_to_rgb(frame) -> None (in place channel swap on N*3 uint8 buffer)
PyObject* bgr_to_rgb(PyObject*, PyObject* args) {
    PyObject* frame_obj;
    if (!PyArg_ParseTuple(args, "O", &frame_obj)) return nullptr;
    BufferGuard buf;
    if (!get_buffer(frame_obj, &buf, PyBUF_WRITABLE | PyBUF_C_CONTIGUOUS, "frame")) {
        return nullptr;
    }
    if (buf.view.len % 3 != 0) {
        PyErr_SetString(PyExc_ValueError, "buffer length must be divisible by 3");
        return nullptr;
    }
    uint8_t* px = static_cast<uint8_t*>(buf.view.buf);
    Py_ssize_t npix = buf.view.len / 3;
    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t i = 0; i < npix; ++i) {
        std::swap(px[i * 3], px[i * 3 + 2]);
    }
    Py_END_ALLOW_THREADS
    Py_RETURN_NONE;
}

// i420_to_bgr(src, dst, width, height, rgb) -> None
//
// src: contiguous uint8 I420 picture, (h*3/2, w) — Y then U then V planes;
// dst: writable contiguous uint8 (h, w, 3).  Applies EXACTLY the function
// cv2/swscale uses for untagged/BT.601-limited yuv420p -> bgr24 (integer
// fixed-point closed form learned exhaustively; see truely_tpu/ops/yuv.py
// for provenance and the on-device twin) — so host frames produced here
// are byte-identical to cv2.VideoCapture's BGR output for the same stream.
// rgb != 0 reverses channel order (corrected-mode RGB).
inline uint8_t clip8(int32_t v) {
    return static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
}

PyObject* i420_to_bgr(PyObject*, PyObject* args) {
    PyObject* src_obj;
    PyObject* dst_obj;
    int w, h, rgb;
    if (!PyArg_ParseTuple(args, "OOiip", &src_obj, &dst_obj, &w, &h, &rgb)) {
        return nullptr;
    }
    BufferGuard src, dst;
    if (!get_buffer(src_obj, &src, PyBUF_C_CONTIGUOUS, "src")) return nullptr;
    if (!get_buffer(dst_obj, &dst, PyBUF_WRITABLE | PyBUF_C_CONTIGUOUS,
                    "dst")) {
        return nullptr;
    }
    if (w <= 0 || h <= 0 || (w % 2) || (h % 2) ||
        src.view.len < (Py_ssize_t)w * h * 3 / 2 ||
        dst.view.len < (Py_ssize_t)w * h * 3) {
        PyErr_SetString(PyExc_ValueError,
                        "i420_to_bgr: bad dims or undersized buffers");
        return nullptr;
    }
    const uint8_t* yp = static_cast<const uint8_t*>(src.view.buf);
    const uint8_t* up = yp + (size_t)w * h;
    const uint8_t* vp = up + (size_t)(w / 2) * (h / 2);
    uint8_t* out = static_cast<uint8_t*>(dst.view.buf);
    const int c0 = rgb ? 2 : 0, c2 = rgb ? 0 : 2;
    Py_BEGIN_ALLOW_THREADS
    // Row-planar arithmetic passes (plain int32 loops the compiler
    // auto-vectorizes; LUT gathers don't), then one interleave pass.
    std::vector<int32_t> tb(w), tg(w), tr(w), q(w);
    std::vector<uint8_t> brow(w), grow(w), rrow(w);
    for (int cy = 0; cy < h / 2; ++cy) {
        const uint8_t* urow = up + (size_t)cy * (w / 2);
        const uint8_t* vrow = vp + (size_t)cy * (w / 2);
        for (int cx = 0; cx < w / 2; ++cx) {
            const int32_t uu = urow[cx], vv = vrow[cx];
            const int32_t b = (132193 * uu - 16920704) >> 16;
            const int32_t g =
                ((-25673 * uu + 3286144) >> 16) + ((-53281 * vv + 6819968) >> 16);
            const int32_t r = (104593 * vv - 13387904) >> 16;
            tb[2 * cx] = tb[2 * cx + 1] = b;
            tg[2 * cx] = tg[2 * cx + 1] = g;
            tr[2 * cx] = tr[2 * cx + 1] = r;
        }
        for (int sub = 0; sub < 2; ++sub) {
            const int y = 2 * cy + sub;
            const uint8_t* yrow = yp + (size_t)y * w;
            uint8_t* orow = out + (size_t)y * w * 3;
            for (int x = 0; x < w; ++x)
                q[x] = (76305 * (int32_t)yrow[x] - 1219995) >> 16;
            for (int x = 0; x < w; ++x) brow[x] = clip8(q[x] + tb[x]);
            for (int x = 0; x < w; ++x) grow[x] = clip8(q[x] + tg[x]);
            for (int x = 0; x < w; ++x) rrow[x] = clip8(q[x] + tr[x]);
            for (int x = 0; x < w; ++x) {
                orow[3 * x + c0] = brow[x];
                orow[3 * x + 1] = grow[x];
                orow[3 * x + c2] = rrow[x];
            }
        }
    }
    Py_END_ALLOW_THREADS
    Py_RETURN_NONE;
}

PyMethodDef methods[] = {
    {"pack_frames", pack_frames, METH_VARARGS,
     "pack_frames(dst, frames, offsets): memcpy frames into batch rows"},
    {"i420_to_bgr", i420_to_bgr, METH_VARARGS,
     "i420_to_bgr(src, dst, w, h, rgb): exact swscale-compatible "
     "yuv420p->bgr24 (rgb flips channel order)"},
    {"draw_rect", draw_rect, METH_VARARGS,
     "draw_rect(frame, h, w, x1, y1, x2, y2, b, g, r, thickness)"},
    {"bgr_to_rgb", bgr_to_rgb, METH_VARARGS,
     "bgr_to_rgb(frame): in-place channel swap"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "framepack",
    "Native host-side frame packing and overlay drawing", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_framepack() { return PyModule_Create(&module); }
