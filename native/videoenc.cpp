// videoenc — first-party native H.264 encode for the annotated output.
//
// The reference writes its annotated video with cv2.VideoWriter
// (server/model.py:35-36,77), requesting H.264.  cv2's bundled FFmpeg in
// this image has no usable H.264 encoder (h264_v4l2m2m fails to
// configure, printing errors on every open), so the cv2 path degrades to
// MPEG-4 Part 2 ("mp4v") — an old codec with far worse quality per bit.
// The SYSTEM libavcodec does ship libx264, so this extension encodes
// H.264 directly: BGR frames in (swscale to yuv420p), x264 ultrafast/crf
// 23, MP4 muxing via libavformat.  media/encode.VideoWriter prefers this
// module and falls back to the cv2 chain when it isn't built.
//
// API (CPython module, GIL released around all libav calls):
//   open(path, width, height, fps_num, fps_den) -> capsule
//   write(capsule, frame)   frame: contiguous (H, W, 3) uint8 BGR buffer
//   close(capsule)          flushes + writes the MP4 trailer (required
//                           for a playable file)

#define PY_SSIZE_T_CLEAN
#include <Python.h>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <cstdint>

namespace {

struct Enc {
    AVFormatContext* fmt = nullptr;
    AVCodecContext* ctx = nullptr;
    AVStream* stream = nullptr;
    AVFrame* frame = nullptr;
    AVPacket* pkt = nullptr;
    SwsContext* sws = nullptr;
    int64_t pts = 0;
    bool header_written = false;
    bool finalized = false;
};

void enc_free(Enc* e) {
    if (!e) return;
    if (e->sws) sws_freeContext(e->sws);
    if (e->frame) av_frame_free(&e->frame);
    if (e->pkt) av_packet_free(&e->pkt);
    if (e->ctx) avcodec_free_context(&e->ctx);
    if (e->fmt) {
        if (e->fmt->pb) avio_closep(&e->fmt->pb);
        avformat_free_context(e->fmt);
    }
    delete e;
}

void capsule_destructor(PyObject* cap) {
    enc_free(static_cast<Enc*>(PyCapsule_GetPointer(cap, "videoenc.Enc")));
}

Enc* get_enc(PyObject* cap) {
    auto* e = static_cast<Enc*>(PyCapsule_GetPointer(cap, "videoenc.Enc"));
    if (!e) PyErr_SetString(PyExc_ValueError, "invalid or closed encoder handle");
    return e;
}

// Drain ready packets from the encoder into the muxer.  Returns 0 or a
// negative AVERROR.  Runs without the GIL.
int drain(Enc* e) {
    while (true) {
        int err = avcodec_receive_packet(e->ctx, e->pkt);
        if (err == AVERROR(EAGAIN) || err == AVERROR_EOF) return 0;
        if (err < 0) return err;
        av_packet_rescale_ts(e->pkt, e->ctx->time_base, e->stream->time_base);
        // Explicit per-sample duration: without it the muxer infers the
        // FINAL sample's duration as 0 and demuxers clip the last frame.
        e->pkt->duration = av_rescale_q(
            1, e->ctx->time_base, e->stream->time_base);
        e->pkt->stream_index = e->stream->index;
        err = av_interleaved_write_frame(e->fmt, e->pkt);
        if (err < 0) return err;
    }
}

PyObject* ve_open(PyObject*, PyObject* args) {
    const char* path;
    int w, h, fps_num, fps_den;
    // Optional encoder ladder knobs (scripts/bench_x264.py measures the
    // preset x crf x threads x slices grid; production default stays
    // ultrafast/23/auto — PERFORMANCE.md "annotated path").
    const char* preset = "ultrafast";
    int crf = 23, threads = 0, slices = 0;
    if (!PyArg_ParseTuple(args, "siiii|siii", &path, &w, &h, &fps_num,
                          &fps_den, &preset, &crf, &threads, &slices)) {
        return nullptr;
    }
    if (w <= 0 || h <= 0 || (w % 2) || (h % 2) || fps_num <= 0 || fps_den <= 0) {
        PyErr_SetString(PyExc_ValueError,
                        "videoenc: even positive dims and positive fps required");
        return nullptr;
    }
    if (crf < 0 || crf > 51 || threads < 0 || slices < 0) {
        PyErr_SetString(PyExc_ValueError,
                        "videoenc: crf in [0,51], threads/slices >= 0");
        return nullptr;
    }

    Enc* e = new Enc();
    int err = 0;
    const AVCodec* codec = nullptr;

    Py_BEGIN_ALLOW_THREADS
    err = avformat_alloc_output_context2(&e->fmt, nullptr, "mp4", path);
    if (err >= 0) {
        codec = avcodec_find_encoder_by_name("libx264");
        if (!codec) err = AVERROR_ENCODER_NOT_FOUND;
    }
    if (err >= 0) {
        e->ctx = avcodec_alloc_context3(codec);
        e->stream = avformat_new_stream(e->fmt, nullptr);
        e->frame = av_frame_alloc();
        e->pkt = av_packet_alloc();
        if (!e->ctx || !e->stream || !e->frame || !e->pkt) err = AVERROR(ENOMEM);
    }
    if (err >= 0) {
        e->ctx->width = w;
        e->ctx->height = h;
        e->ctx->pix_fmt = AV_PIX_FMT_YUV420P;
        e->ctx->time_base = AVRational{fps_den, fps_num};
        e->ctx->framerate = AVRational{fps_num, fps_den};
        // Single-pass quality encode; default ultrafast/crf 23 (still
        // beats mp4v on quality-per-bit by a wide margin).  threads=0
        // leaves x264's auto frame-threading (cores); slices>0 switches
        // to sliced-threads (lower latency, slightly worse compression).
        av_opt_set(e->ctx->priv_data, "preset", preset, 0);
        char crf_s[8];
        snprintf(crf_s, sizeof crf_s, "%d", crf);
        av_opt_set(e->ctx->priv_data, "crf", crf_s, 0);
        if (threads > 0) e->ctx->thread_count = threads;
        if (slices > 0) {
            av_opt_set_int(e->ctx->priv_data, "slices", slices, 0);
            av_opt_set(e->ctx->priv_data, "x264-params",
                       "sliced-threads=1", 0);
        }
        if (e->fmt->oformat->flags & AVFMT_GLOBALHEADER)
            e->ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
        err = avcodec_open2(e->ctx, codec, nullptr);
    }
    if (err >= 0) {
        e->stream->time_base = e->ctx->time_base;
        err = avcodec_parameters_from_context(e->stream->codecpar, e->ctx);
    }
    if (err >= 0) err = avio_open(&e->fmt->pb, path, AVIO_FLAG_WRITE);
    if (err >= 0) {
        err = avformat_write_header(e->fmt, nullptr);
        if (err >= 0) e->header_written = true;
    }
    if (err >= 0) {
        e->frame->format = AV_PIX_FMT_YUV420P;
        e->frame->width = w;
        e->frame->height = h;
        err = av_frame_get_buffer(e->frame, 0);
    }
    if (err >= 0) {
        e->sws = sws_getContext(w, h, AV_PIX_FMT_BGR24, w, h,
                                AV_PIX_FMT_YUV420P, SWS_BILINEAR,
                                nullptr, nullptr, nullptr);
        if (!e->sws) err = AVERROR(ENOMEM);
    }
    Py_END_ALLOW_THREADS

    if (err < 0) {
        char buf[256];
        av_strerror(err, buf, sizeof buf);
        enc_free(e);
        PyErr_Format(PyExc_IOError, "videoenc: could not open %s: %s", path, buf);
        return nullptr;
    }
    PyObject* cap = PyCapsule_New(e, "videoenc.Enc", capsule_destructor);
    if (!cap) {
        enc_free(e);
        return nullptr;
    }
    return cap;
}

PyObject* ve_write(PyObject*, PyObject* args) {
    PyObject* cap_obj;
    PyObject* frame_obj;
    if (!PyArg_ParseTuple(args, "OO", &cap_obj, &frame_obj)) return nullptr;
    Enc* e = get_enc(cap_obj);
    if (!e) return nullptr;
    if (e->finalized) {
        PyErr_SetString(PyExc_ValueError, "videoenc: writer already closed");
        return nullptr;
    }

    Py_buffer src{};
    if (PyObject_GetBuffer(frame_obj, &src, PyBUF_C_CONTIGUOUS) != 0) {
        PyErr_SetString(PyExc_TypeError, "frame must be a contiguous buffer");
        return nullptr;
    }
    const Py_ssize_t need = (Py_ssize_t)e->ctx->width * e->ctx->height * 3;
    if (src.len < need) {
        PyBuffer_Release(&src);
        PyErr_Format(PyExc_ValueError, "videoenc: frame too small (%zd < %zd)",
                     src.len, need);
        return nullptr;
    }

    int err = 0;
    Py_BEGIN_ALLOW_THREADS
    err = av_frame_make_writable(e->frame);
    if (err >= 0) {
        const uint8_t* in[1] = {static_cast<const uint8_t*>(src.buf)};
        const int in_stride[1] = {3 * e->ctx->width};
        sws_scale(e->sws, in, in_stride, 0, e->ctx->height,
                  e->frame->data, e->frame->linesize);
        e->frame->pts = e->pts++;
        err = avcodec_send_frame(e->ctx, e->frame);
    }
    if (err >= 0) err = drain(e);
    Py_END_ALLOW_THREADS

    PyBuffer_Release(&src);
    if (err < 0) {
        char buf[256];
        av_strerror(err, buf, sizeof buf);
        PyErr_Format(PyExc_IOError, "videoenc: encode error: %s", buf);
        return nullptr;
    }
    Py_RETURN_NONE;
}

PyObject* ve_write_i420(PyObject*, PyObject* args) {
    PyObject* cap_obj;
    PyObject* buf_obj;
    if (!PyArg_ParseTuple(args, "OO", &cap_obj, &buf_obj)) return nullptr;
    Enc* e = get_enc(cap_obj);
    if (!e) return nullptr;
    if (e->finalized) {
        PyErr_SetString(PyExc_ValueError, "videoenc: writer already closed");
        return nullptr;
    }

    Py_buffer src{};
    if (PyObject_GetBuffer(buf_obj, &src, PyBUF_C_CONTIGUOUS) != 0) {
        PyErr_SetString(PyExc_TypeError, "picture must be a contiguous buffer");
        return nullptr;
    }
    const int w = e->ctx->width, h = e->ctx->height;
    const Py_ssize_t need = (Py_ssize_t)w * h * 3 / 2;
    // Exact-size check (not just >=): a wrong-shaped but large-enough
    // buffer would otherwise be silently reinterpreted and encode garbage.
    if (src.len != need) {
        PyBuffer_Release(&src);
        PyErr_Format(PyExc_ValueError,
                     "videoenc: I420 picture must be exactly %zd bytes "
                     "(H*3/2 x W = %d x %d packed layout), got %zd",
                     need, h * 3 / 2, w, src.len);
        return nullptr;
    }
    // When the buffer carries shape info (numpy arrays do), also pin the
    // packed-row layout: (H*3/2, W) — rejects a right-sized buffer whose
    // width/height are swapped or mismatched.
    if (src.ndim == 2 && src.shape != nullptr &&
        (src.shape[0] != (Py_ssize_t)h * 3 / 2 || src.shape[1] != w)) {
        PyErr_Format(PyExc_ValueError,
                     "videoenc: I420 picture shape (%zd, %zd) != (%d, %d)",
                     src.shape[0], src.shape[1], h * 3 / 2, w);
        PyBuffer_Release(&src);
        return nullptr;
    }

    int err = 0;
    Py_BEGIN_ALLOW_THREADS
    err = av_frame_make_writable(e->frame);
    if (err >= 0) {
        // Packed I420 (the cv2 layout: Y as H rows of W, then U and V each
        // as H/4 rows of W holding an (H/2, W/2) plane) copied straight
        // into the encoder frame — no swscale, no colorspace round trip.
        const uint8_t* p = static_cast<const uint8_t*>(src.buf);
        const uint8_t* py = p;
        const uint8_t* pu = p + (size_t)w * h;
        const uint8_t* pv = pu + (size_t)(w / 2) * (h / 2);
        av_image_copy_plane(e->frame->data[0], e->frame->linesize[0],
                            py, w, w, h);
        av_image_copy_plane(e->frame->data[1], e->frame->linesize[1],
                            pu, w / 2, w / 2, h / 2);
        av_image_copy_plane(e->frame->data[2], e->frame->linesize[2],
                            pv, w / 2, w / 2, h / 2);
        e->frame->pts = e->pts++;
        err = avcodec_send_frame(e->ctx, e->frame);
    }
    if (err >= 0) err = drain(e);
    Py_END_ALLOW_THREADS

    PyBuffer_Release(&src);
    if (err < 0) {
        char buf[256];
        av_strerror(err, buf, sizeof buf);
        PyErr_Format(PyExc_IOError, "videoenc: encode error: %s", buf);
        return nullptr;
    }
    Py_RETURN_NONE;
}

PyObject* ve_close(PyObject*, PyObject* args) {
    PyObject* cap_obj;
    if (!PyArg_ParseTuple(args, "O", &cap_obj)) return nullptr;
    auto* e = static_cast<Enc*>(PyCapsule_GetPointer(cap_obj, "videoenc.Enc"));
    if (!e) {
        PyErr_Clear();
        Py_RETURN_NONE;
    }

    int err = 0;
    Py_BEGIN_ALLOW_THREADS
    if (!e->finalized) {
        err = avcodec_send_frame(e->ctx, nullptr);  // flush
        if (err >= 0 || err == AVERROR_EOF) err = drain(e);
        if (err >= 0 && e->header_written) err = av_write_trailer(e->fmt);
        e->finalized = true;
    }
    Py_END_ALLOW_THREADS

    enc_free(e);
    PyCapsule_SetDestructor(cap_obj, nullptr);
    PyCapsule_SetName(cap_obj, "videoenc.closed");
    if (err < 0) {
        char buf[256];
        av_strerror(err, buf, sizeof buf);
        PyErr_Format(PyExc_IOError, "videoenc: finalize error: %s", buf);
        return nullptr;
    }
    Py_RETURN_NONE;
}

PyMethodDef methods[] = {
    {"open", ve_open, METH_VARARGS,
     "open(path, width, height, fps_num, fps_den"
     "[, preset, crf, threads, slices]) -> handle"},
    {"write", ve_write, METH_VARARGS,
     "write(handle, frame): encode one (H, W, 3) uint8 BGR frame"},
    {"write_i420", ve_write_i420, METH_VARARGS,
     "write_i420(handle, packed): encode one packed (H*3//2, W) uint8 "
     "I420 picture without any colorspace conversion"},
    {"close", ve_close, METH_VARARGS,
     "close(handle): flush + write the MP4 trailer"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "videoenc",
    "first-party libx264 H.264 MP4 writer", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_videoenc() {
    av_log_set_level(AV_LOG_ERROR);  // x264 stats/info spam off
    return PyModule_Create(&module);
}
