// Native video decoder for sttm_tpu (the reference uses the external decord
// wheel for this role: llava/utils.py:26). Thin C layer over
// libavformat/libavcodec/libswscale exposed via ctypes:
//   * vd_probe            — container/stream metadata
//   * vd_decode_uniform   — n uniformly-sampled frames, scaled to RGB24
//   * vd_encode_test_video — synthetic mpeg4 clip (test fixture only)
//
// Build: see sttm_tpu/native/__init__.py (g++ -shared -fPIC ... -lavformat
// -lavcodec -lavutil -lswscale).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Reader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  int stream_idx = -1;

  ~Reader() {
    if (dec) avcodec_free_context(&dec);
    if (fmt) avformat_close_input(&fmt);
  }

  int open(const char* path) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -2;
    stream_idx = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
    if (stream_idx < 0) return -3;
    const AVCodec* codec =
        avcodec_find_decoder(fmt->streams[stream_idx]->codecpar->codec_id);
    if (!codec) return -4;
    dec = avcodec_alloc_context3(codec);
    if (!dec) return -5;
    if (avcodec_parameters_to_context(dec, fmt->streams[stream_idx]->codecpar) < 0)
      return -6;
    if (avcodec_open2(dec, codec, nullptr) < 0) return -7;
    return 0;
  }

  AVStream* stream() { return fmt->streams[stream_idx]; }
};

}  // namespace

extern "C" {

typedef struct {
  double duration;   // seconds
  double fps;        // average frame rate
  int width;
  int height;
  int64_t nb_frames; // container-reported (may be 0)
} VDInfo;

int vd_probe(const char* path, VDInfo* info) {
  Reader r;
  int rc = r.open(path);
  if (rc != 0) return rc;
  AVStream* st = r.stream();
  info->width = r.dec->width;
  info->height = r.dec->height;
  AVRational afr = st->avg_frame_rate;
  info->fps = (afr.den > 0) ? av_q2d(afr) : 0.0;
  if (st->duration > 0)
    info->duration = st->duration * av_q2d(st->time_base);
  else if (r.fmt->duration > 0)
    info->duration = (double)r.fmt->duration / AV_TIME_BASE;
  else
    info->duration = 0.0;
  info->nb_frames = st->nb_frames;
  return 0;
}

// Decode `n` frames at (approximately) the timestamps targets[0..n-1] given
// in seconds, sequentially scanning the stream once (robust for codecs with
// sparse keyframes). Output: RGB24 frames scaled to out_w x out_h, written
// consecutively into `out`; realized timestamps into `ts` (seconds).
int vd_decode_at(const char* path, const double* targets, int n, int out_w,
                 int out_h, uint8_t* out, double* ts) {
  if (n <= 0) return 0;
  Reader r;
  int rc = r.open(path);
  if (rc != 0) return rc;
  AVStream* st = r.stream();
  double tb = av_q2d(st->time_base);

  SwsContext* sws =
      sws_getContext(r.dec->width, r.dec->height, r.dec->pix_fmt, out_w, out_h,
                     AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr, nullptr, nullptr);
  if (!sws) return -10;

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int next = 0;  // next target index to satisfy
  int frame_bytes = out_w * out_h * 3;
  uint8_t* dst_data[4] = {nullptr};
  int dst_linesize[4] = {out_w * 3, 0, 0, 0};

  auto emit = [&](AVFrame* f, double t_sec) {
    while (next < n && t_sec + 1e-9 >= targets[next]) {
      dst_data[0] = out + (size_t)next * frame_bytes;
      sws_scale(sws, f->data, f->linesize, 0, r.dec->height, dst_data,
                dst_linesize);
      ts[next] = t_sec;
      ++next;
    }
  };

  int ret = 0;
  while (next < n && (ret = av_read_frame(r.fmt, pkt)) >= 0) {
    if (pkt->stream_index == r.stream_idx) {
      if (avcodec_send_packet(r.dec, pkt) == 0) {
        while (avcodec_receive_frame(r.dec, frame) == 0) {
          int64_t pts = frame->best_effort_timestamp;
          double t_sec = (pts == AV_NOPTS_VALUE) ? 0.0 : pts * tb;
          emit(frame, t_sec);
          if (next >= n) break;
        }
      }
    }
    av_packet_unref(pkt);
  }
  // flush decoder
  if (next < n) {
    avcodec_send_packet(r.dec, nullptr);
    while (next < n && avcodec_receive_frame(r.dec, frame) == 0) {
      int64_t pts = frame->best_effort_timestamp;
      double t_sec = (pts == AV_NOPTS_VALUE) ? 0.0 : pts * tb;
      emit(frame, t_sec);
    }
  }
  // duplicate the last decoded frame for any unsatisfied targets
  while (next > 0 && next < n) {
    memcpy(out + (size_t)next * frame_bytes, out + (size_t)(next - 1) * frame_bytes,
           frame_bytes);
    ts[next] = ts[next - 1];
    ++next;
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  sws_freeContext(sws);
  return (next == n) ? 0 : -11;
}

int vd_decode_uniform(const char* path, int n, int out_w, int out_h,
                      uint8_t* out, double* ts) {
  VDInfo info;
  int rc = vd_probe(path, &info);
  if (rc != 0) return rc;
  double dur = info.duration > 0 ? info.duration : 1.0;
  std::vector<double> targets(n);
  for (int i = 0; i < n; ++i) targets[i] = dur * i / n;
  return vd_decode_at(path, targets.data(), n, out_w, out_h, out, ts);
}

// Test fixture: write an n-frame out_w x out_h mpeg4 clip of moving bars.
int vd_encode_test_video(const char* path, int n, int w, int h, int fps) {
  AVFormatContext* fmt = nullptr;
  if (avformat_alloc_output_context2(&fmt, nullptr, nullptr, path) < 0) return -1;
  const AVCodec* codec = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  if (!codec) return -2;
  AVStream* st = avformat_new_stream(fmt, nullptr);
  AVCodecContext* enc = avcodec_alloc_context3(codec);
  enc->width = w;
  enc->height = h;
  enc->pix_fmt = AV_PIX_FMT_YUV420P;
  enc->time_base = {1, fps};
  enc->framerate = {fps, 1};
  enc->bit_rate = 400000;
  enc->gop_size = 12;
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(enc, codec, nullptr) < 0) return -3;
  avcodec_parameters_from_context(st->codecpar, enc);
  st->time_base = enc->time_base;
  if (!(fmt->oformat->flags & AVFMT_NOFILE))
    if (avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) return -4;
  if (avformat_write_header(fmt, nullptr) < 0) return -5;

  AVFrame* frame = av_frame_alloc();
  frame->format = enc->pix_fmt;
  frame->width = w;
  frame->height = h;
  av_frame_get_buffer(frame, 0);
  AVPacket* pkt = av_packet_alloc();

  auto write_packets = [&](AVFrame* f) {
    avcodec_send_frame(enc, f);
    while (avcodec_receive_packet(enc, pkt) == 0) {
      av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
      pkt->stream_index = st->index;
      av_interleaved_write_frame(fmt, pkt);
      av_packet_unref(pkt);
    }
  };

  for (int i = 0; i < n; ++i) {
    av_frame_make_writable(frame);
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x)
        frame->data[0][y * frame->linesize[0] + x] =
            (uint8_t)(((x + i * 4) / 8 % 2) ? 220 : 30);
    for (int y = 0; y < h / 2; ++y)
      for (int x = 0; x < w / 2; ++x) {
        frame->data[1][y * frame->linesize[1] + x] = 128;
        frame->data[2][y * frame->linesize[2] + x] = (uint8_t)(64 + (i * 8) % 128);
      }
    frame->pts = i;
    write_packets(frame);
  }
  write_packets(nullptr);  // flush
  av_write_trailer(fmt);
  avcodec_free_context(&enc);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  return 0;
}

}  // extern "C"
