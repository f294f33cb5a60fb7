// videodec — first-party native H.264/H.265/VP9 demux+decode to yuv420p.
//
// The reference decodes via OpenCV's cv2.VideoCapture (FFmpeg inside,
// server/model.py:23,42-45), which converts every frame to packed BGR on
// the host (swscale) before Python ever sees it.  For the TPU pipeline
// that conversion is pure waste: H.264 content is 4:2:0, so uploading
// native YUV420 planes is 1.5 bytes/px instead of 3 — half the
// host->device bytes — and the YUV->BGR conversion runs on-device as the
// first (fused) step of the bucket jit instead of on the host.  This
// extension demuxes+decodes with libavformat/libavcodec directly and
// hands out the decoder's own yuv420p planes, skipping swscale entirely.
//
// API (CPython module, GIL released around all libav calls):
//   open(path)  -> (capsule, width, height, fps_num, fps_den, nb_frames)
//   read(capsule, dst)
//       dst: writable contiguous uint8 buffer of >= w*h*3/2 bytes; filled
//       with planar Y (h rows of w), then U (h/2 rows of w/2), then V.
//       Returns True on success, False on EOF.  Raises on decode error
//       or if the stream is not 8-bit yuv420p/yuvj420p (caller falls
//       back to the cv2 path).
//   close(capsule)
//
// Built by scripts/build_native.sh; truely_tpu.media.native loads it when
// present and the decode layer falls back to cv2 otherwise.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
}

#include <cstdint>
#include <cstring>

namespace {

struct Dec {
    AVFormatContext* fmt = nullptr;
    AVCodecContext* ctx = nullptr;
    AVPacket* pkt = nullptr;
    AVFrame* frame = nullptr;
    int stream_index = -1;
    bool draining = false;
    bool eof = false;
};

void dec_free(Dec* d) {
    if (!d) return;
    if (d->frame) av_frame_free(&d->frame);
    if (d->pkt) av_packet_free(&d->pkt);
    if (d->ctx) avcodec_free_context(&d->ctx);
    if (d->fmt) avformat_close_input(&d->fmt);
    delete d;
}

void capsule_destructor(PyObject* cap) {
    dec_free(static_cast<Dec*>(PyCapsule_GetPointer(cap, "videodec.Dec")));
}

Dec* get_dec(PyObject* cap) {
    auto* d = static_cast<Dec*>(PyCapsule_GetPointer(cap, "videodec.Dec"));
    if (!d) PyErr_SetString(PyExc_ValueError, "invalid or closed decoder handle");
    return d;
}

PyObject* vd_open(PyObject*, PyObject* args) {
    const char* path;
    // skip_nonref=1: decoder discards non-reference frames
    // (AVDISCARD_NONREF) — a PROBE mode for sample-only decode
    // (scripts/probe_sample_decode.py): several-fold cheaper on B-frame
    // content, but delivered frames are no longer every coded frame, so
    // the product sampling law cannot use it exactly.  Default 0.
    int skip_nonref = 0;
    if (!PyArg_ParseTuple(args, "s|i", &path, &skip_nonref)) return nullptr;

    Dec* d = new Dec();
    int err = 0;
    const AVCodec* codec = nullptr;

    Py_BEGIN_ALLOW_THREADS
    err = avformat_open_input(&d->fmt, path, nullptr, nullptr);
    if (err >= 0) err = avformat_find_stream_info(d->fmt, nullptr);
    if (err >= 0) {
        d->stream_index =
            av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
        if (d->stream_index < 0 || !codec) err = AVERROR_STREAM_NOT_FOUND;
    }
    if (err >= 0) {
        d->ctx = avcodec_alloc_context3(codec);
        if (!d->ctx) err = AVERROR(ENOMEM);
    }
    if (err >= 0)
        err = avcodec_parameters_to_context(
            d->ctx, d->fmt->streams[d->stream_index]->codecpar);
    if (err >= 0) {
        // Frame-threaded decode (0 = auto-detect core count); cv2's FFmpeg
        // wrapper enables the same, and single-threaded H.264 decode would
        // dominate the pipeline at 1080p.
        d->ctx->thread_count = 0;
        if (skip_nonref) d->ctx->skip_frame = AVDISCARD_NONREF;
        err = avcodec_open2(d->ctx, codec, nullptr);
    }
    if (err >= 0) {
        d->pkt = av_packet_alloc();
        d->frame = av_frame_alloc();
        if (!d->pkt || !d->frame) err = AVERROR(ENOMEM);
    }
    Py_END_ALLOW_THREADS

    if (err < 0) {
        char buf[256];
        av_strerror(err, buf, sizeof buf);
        dec_free(d);
        PyErr_Format(PyExc_IOError, "videodec: could not open %s: %s", path, buf);
        return nullptr;
    }

    AVStream* st = d->fmt->streams[d->stream_index];
    AVRational fps = st->avg_frame_rate;
    if (fps.num <= 0 || fps.den <= 0) fps = st->r_frame_rate;
    long long nb = st->nb_frames;
    if (nb <= 0 && st->duration > 0 && fps.num > 0) {
        nb = (long long)(st->duration * av_q2d(st->time_base) * av_q2d(fps) + 0.5);
    }
    PyObject* cap = PyCapsule_New(d, "videodec.Dec", capsule_destructor);
    if (!cap) {
        dec_free(d);
        return nullptr;
    }
    return Py_BuildValue("(NiiiiL)", cap, d->ctx->width, d->ctx->height,
                         fps.num, fps.den, nb);
}

// Decode the next frame into d->frame.  Returns 1 on frame, 0 on EOF,
// negative AVERROR on failure.  Runs without the GIL.
int next_frame(Dec* d) {
    if (d->eof) return 0;
    while (true) {
        int err = avcodec_receive_frame(d->ctx, d->frame);
        if (err == 0) return 1;
        if (err == AVERROR_EOF) {
            d->eof = true;
            return 0;
        }
        if (err != AVERROR(EAGAIN)) return err;
        if (d->draining) continue;  // EAGAIN while draining shouldn't happen
        while (true) {
            err = av_read_frame(d->fmt, d->pkt);
            if (err == AVERROR_EOF) {
                d->draining = true;
                err = avcodec_send_packet(d->ctx, nullptr);  // flush
                if (err < 0 && err != AVERROR_EOF) return err;
                break;
            }
            if (err < 0) return err;
            if (d->pkt->stream_index != d->stream_index) {
                av_packet_unref(d->pkt);
                continue;
            }
            err = avcodec_send_packet(d->ctx, d->pkt);
            av_packet_unref(d->pkt);
            if (err < 0 && err != AVERROR(EAGAIN)) return err;
            break;
        }
    }
}

PyObject* vd_read(PyObject*, PyObject* args) {
    PyObject* cap_obj;
    PyObject* dst_obj;
    if (!PyArg_ParseTuple(args, "OO", &cap_obj, &dst_obj)) return nullptr;
    Dec* d = get_dec(cap_obj);
    if (!d) return nullptr;

    Py_buffer dst{};
    if (PyObject_GetBuffer(dst_obj, &dst,
                           PyBUF_WRITABLE | PyBUF_C_CONTIGUOUS) != 0) {
        PyErr_SetString(PyExc_TypeError, "dst must be a writable contiguous buffer");
        return nullptr;
    }

    int got = 0;
    int bad_format = 0;
    Py_ssize_t need = 0;
    Py_BEGIN_ALLOW_THREADS
    got = next_frame(d);
    if (got == 1) {
        const int w = d->frame->width, h = d->frame->height;
        need = (Py_ssize_t)w * h * 3 / 2;
        if ((d->frame->format != AV_PIX_FMT_YUV420P &&
             d->frame->format != AV_PIX_FMT_YUVJ420P) ||
            (w % 2) || (h % 2)) {
            bad_format = 1;
        } else if (dst.len >= need) {
            uint8_t* out = static_cast<uint8_t*>(dst.buf);
            const int cw = w / 2, ch = h / 2;
            for (int r = 0; r < h; ++r)
                std::memcpy(out + (size_t)r * w,
                            d->frame->data[0] + (size_t)r * d->frame->linesize[0], w);
            uint8_t* up = out + (size_t)w * h;
            for (int r = 0; r < ch; ++r)
                std::memcpy(up + (size_t)r * cw,
                            d->frame->data[1] + (size_t)r * d->frame->linesize[1], cw);
            uint8_t* vp = up + (size_t)cw * ch;
            for (int r = 0; r < ch; ++r)
                std::memcpy(vp + (size_t)r * cw,
                            d->frame->data[2] + (size_t)r * d->frame->linesize[2], cw);
        }
        av_frame_unref(d->frame);
    }
    Py_END_ALLOW_THREADS

    Py_ssize_t dst_len = dst.len;
    PyBuffer_Release(&dst);
    if (got == 1 && bad_format) {
        PyErr_SetString(PyExc_ValueError,
                        "videodec: stream is not 8-bit yuv420p (caller "
                        "should fall back to the cv2 path)");
        return nullptr;
    }
    if (got == 1 && dst_len < need) {
        PyErr_Format(PyExc_ValueError,
                     "videodec: dst too small (%zd < %zd)", dst_len, need);
        return nullptr;
    }
    if (got < 0) {
        char buf[256];
        av_strerror(got, buf, sizeof buf);
        PyErr_Format(PyExc_IOError, "videodec: decode error: %s", buf);
        return nullptr;
    }
    if (got == 0) Py_RETURN_FALSE;
    Py_RETURN_TRUE;
}

PyObject* vd_skip(PyObject*, PyObject* args) {
    // Decode the next frame WITHOUT exporting its planes: inter-frame
    // references force the decode itself, but the ~1.5*W*H-byte plane
    // copy (and the Python-side buffer churn) is pure waste for frames
    // the ~7 Hz sampling law discards — at 1080p60 interval 8 that is
    // 7/8 of all frames.  Returns True on frame, False on EOF.
    PyObject* cap_obj;
    if (!PyArg_ParseTuple(args, "O", &cap_obj)) return nullptr;
    Dec* d = get_dec(cap_obj);
    if (!d) return nullptr;
    int got = 0;
    Py_BEGIN_ALLOW_THREADS
    got = next_frame(d);
    if (got == 1) av_frame_unref(d->frame);
    Py_END_ALLOW_THREADS
    if (got < 0) {
        char buf[256];
        av_strerror(got, buf, sizeof buf);
        PyErr_Format(PyExc_IOError, "videodec: decode error: %s", buf);
        return nullptr;
    }
    if (got == 0) Py_RETURN_FALSE;
    Py_RETURN_TRUE;
}

PyObject* vd_pixfmt(PyObject*, PyObject* args) {
    PyObject* cap_obj;
    if (!PyArg_ParseTuple(args, "O", &cap_obj)) return nullptr;
    Dec* d = get_dec(cap_obj);
    if (!d) return nullptr;
    const char* name = av_get_pix_fmt_name((AVPixelFormat)d->ctx->pix_fmt);
    return PyUnicode_FromString(name ? name : "unknown");
}

PyObject* vd_colorinfo(PyObject*, PyObject* args) {
    // (colorspace, color_range) tag names, e.g. ("unknown", "tv") —
    // the Python layer gates the exact on-device BT.601-limited
    // conversion on these (anything else falls back to the cv2 path).
    PyObject* cap_obj;
    if (!PyArg_ParseTuple(args, "O", &cap_obj)) return nullptr;
    Dec* d = get_dec(cap_obj);
    if (!d) return nullptr;
    const char* space = av_color_space_name(d->ctx->colorspace);
    const char* range = av_color_range_name(d->ctx->color_range);
    return Py_BuildValue("(ss)", space ? space : "unknown",
                         range ? range : "unknown");
}

PyObject* vd_close(PyObject*, PyObject* args) {
    PyObject* cap_obj;
    if (!PyArg_ParseTuple(args, "O", &cap_obj)) return nullptr;
    auto* d = static_cast<Dec*>(PyCapsule_GetPointer(cap_obj, "videodec.Dec"));
    if (d) {
        dec_free(d);
        // A capsule pointer cannot be NULL; retire the handle by renaming
        // it so get_dec (which looks up "videodec.Dec") refuses it, and
        // drop the destructor so the freed Dec is never double-freed.
        PyCapsule_SetDestructor(cap_obj, nullptr);
        PyCapsule_SetName(cap_obj, "videodec.closed");
    } else {
        PyErr_Clear();
    }
    Py_RETURN_NONE;
}

PyMethodDef methods[] = {
    {"open", vd_open, METH_VARARGS,
     "open(path[, skip_nonref]) -> (handle, width, height, fps_num, "
     "fps_den, nb_frames)"},
    {"read", vd_read, METH_VARARGS,
     "read(handle, dst) -> bool; fills dst with planar yuv420 (Y,U,V)"},
    {"skip", vd_skip, METH_VARARGS,
     "skip(handle) -> bool; decode the next frame without exporting it"},
    {"pixfmt", vd_pixfmt, METH_VARARGS, "pixfmt(handle) -> str"},
    {"colorinfo", vd_colorinfo, METH_VARARGS,
     "colorinfo(handle) -> (colorspace, color_range) tag names"},
    {"close", vd_close, METH_VARARGS, "close(handle)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "videodec",
    "first-party libav demux+decode to yuv420p planes", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_videodec() { return PyModule_Create(&module); }
