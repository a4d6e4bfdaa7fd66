// zsvc_video: libavformat/libavcodec sequential video-frame gatherer.
//
// TPU-native replacement for the reference's cv2.VideoCapture decode stage
// (/root/reference/auxiliary/auxiliary_dataset.py:158-208) for the 'video'
// loader: where the frame-dir path already decodes GIL-free through the
// native libjpeg pool (zsvc_decode.cpp), encoded video files previously went
// through cv2 inside Python threads. This library decodes straight into a
// caller-provided RGB buffer — no Python GIL, no per-frame numpy allocation,
// no BGR->RGB extra pass (swscale converts to RGB24 directly).
//
// Semantics mirror data/decode.py::decode_video (itself mirroring the
// reference): sequential decode from frame 0 up to the highest wanted index,
// no seeking; a read/decode failure mid-stream simply ends the scan and the
// Python side repeat-fills in gather order; container metadata that reports
// non-positive dims/frame-count is a probe failure (broken-sample path).
//
// Build: see native/Makefile (links libavformat/libavcodec/libavutil/libswscale).

#include <algorithm>
#include <cstring>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

namespace {

// libav prints a deprecation WARNING per sws context for yuvj* inputs (the
// format every MJPEG stream uses); the pixels are converted correctly (cv2
// bit-parity is tested), so drop below-error chatter once at load time.
struct LogSilencer {
  LogSilencer() { av_log_set_level(AV_LOG_ERROR); }
};
const LogSilencer g_log_silencer;

struct Reader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  SwsContext* sws = nullptr;
  int stream_index = -1;

  ~Reader() {
    if (sws) sws_freeContext(sws);
    if (dec) avcodec_free_context(&dec);
    if (fmt) avformat_close_input(&fmt);
  }

  bool open(const char* path) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return false;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return false;
    const AVCodec* codec = nullptr;
    stream_index =
        av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
    if (stream_index < 0 || !codec) return false;
    dec = avcodec_alloc_context3(codec);
    if (!dec) return false;
    AVStream* st = fmt->streams[stream_index];
    if (avcodec_parameters_to_context(dec, st->codecpar) < 0) return false;
    dec->thread_count = 0;  // codec-internal threading (still no GIL)
    if (avcodec_open2(dec, codec, nullptr) < 0) return false;
    return dec->width > 0 && dec->height > 0;
  }

  // cv2 CAP_PROP_FRAME_COUNT analog: container metadata first, then a
  // duration * fps estimate (both are what OpenCV's ffmpeg backend reports).
  long frame_count() const {
    AVStream* st = fmt->streams[stream_index];
    if (st->nb_frames > 0) return st->nb_frames;
    double fps = av_q2d(st->avg_frame_rate);
    if (fps <= 0) fps = av_q2d(st->r_frame_rate);
    double dur = 0;
    if (st->duration > 0)
      dur = st->duration * av_q2d(st->time_base);
    else if (fmt->duration > 0)
      dur = static_cast<double>(fmt->duration) / AV_TIME_BASE;
    if (fps > 0 && dur > 0) return static_cast<long>(dur * fps + 0.5);
    return 0;
  }
};

}  // namespace

extern "C" {

// Probe: -> 0 on success, fills (n_frames, h, w). Any non-positive value on
// the Python side takes the broken-sample path (weight 0).
int zsvc_video_probe(const char* path, long* n_frames, int* h, int* w) {
  Reader r;
  if (!r.open(path)) return -1;
  *n_frames = r.frame_count();
  *h = r.dec->height;
  *w = r.dec->width;
  return 0;
}

// Decode frames [0, max(wanted)] sequentially; for each wanted[i] (sorted,
// unique, ascending) that decodes, write RGB24 rows into out[i] ([n, h, w, 3])
// and set ok[i] = 1. Returns the number of frames decoded OK (0 => caller
// treats the sample as broken). h/w must match the probe.
int zsvc_video_gather(const char* path, const long* wanted, int n,
                      unsigned char* out, int h, int w, unsigned char* ok) {
  if (n <= 0) return 0;
  std::memset(ok, 0, n);
  Reader r;
  if (!r.open(path) || r.dec->width != w || r.dec->height != h) return 0;

  r.sws = sws_getContext(w, h, r.dec->pix_fmt, w, h, AV_PIX_FMT_RGB24,
                         SWS_BILINEAR, nullptr, nullptr, nullptr);
  if (!r.sws) return 0;

  const long last_wanted = wanted[n - 1];
  const size_t frame_bytes = static_cast<size_t>(h) * w * 3;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  long pos = 0;       // display position of the next received frame
  int cursor = 0;     // next slot of `wanted` to satisfy
  int n_ok = 0;
  bool eof = false;

  auto take = [&](AVFrame* f) {
    while (cursor < n && wanted[cursor] < pos) ++cursor;
    if (cursor < n && wanted[cursor] == pos) {
      uint8_t* dst[1] = {out + frame_bytes * cursor};
      int dst_stride[1] = {w * 3};
      sws_scale(r.sws, f->data, f->linesize, 0, h, dst, dst_stride);
      ok[cursor] = 1;
      ++n_ok;
      ++cursor;
    }
    ++pos;
  };

  while (pos <= last_wanted && cursor < n) {
    int ret = eof ? AVERROR_EOF : av_read_frame(r.fmt, pkt);
    if (ret >= 0) {
      if (pkt->stream_index == r.stream_index) {
        if (avcodec_send_packet(r.dec, pkt) < 0) {
          av_packet_unref(pkt);
          break;  // decode error: end the scan (cv2 read-failure analog)
        }
      }
      av_packet_unref(pkt);
    } else {
      if (!eof) {
        eof = true;
        avcodec_send_packet(r.dec, nullptr);  // flush delayed frames
      } else {
        break;
      }
    }
    for (;;) {
      int rr = avcodec_receive_frame(r.dec, frame);
      if (rr == AVERROR(EAGAIN)) break;
      if (rr < 0) {  // AVERROR_EOF or error
        eof = true;
        pos = last_wanted + 1;  // nothing more will arrive
        break;
      }
      take(frame);
      av_frame_unref(frame);
      if (pos > last_wanted) break;
    }
  }
  av_frame_free(&frame);
  av_packet_free(&pkt);
  return n_ok;
}

}  // extern "C"
