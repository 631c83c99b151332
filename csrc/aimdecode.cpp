// aimdecode — random-access video frame decoder with fused scale.
//
// TPU-native replacement for the reference's decord dependency
// (mmaction/datasets/pipelines/loading.py:933-1017) including the fork's
// patched-decord fused decode+resize (FusedDecordInit, loading.py:1678-1753):
// sws_scale performs YUV->RGB conversion and short-side resize in one pass,
// writing straight into the caller-provided (numpy) buffer.
//
// C API (ctypes-friendly, see adapt_image_models_tpu/data/cpp_decoder.py):
//   void*   aim_open(const char* path, int short_side);  // 0 = native size
//   long    aim_num_frames(void* h);
//   int     aim_frame_size(void* h, int* height, int* width); // output size
//   double  aim_avg_fps(void* h);
//   int     aim_get_frames(void* h, const long* indices, int n, uint8_t* out);
//   void    aim_close(void* h);
//   const char* aim_last_error();
//
// Seek strategy: requests are decoded in ascending order; forward gaps under
// SEEK_THRESHOLD frames are reached by decoding ahead, otherwise we
// av_seek_frame to the keyframe at/before the target and roll forward —
// matching decord's random-access behaviour closely enough that SampleFrames
// index semantics (np.unique'd, sorted) are frame-exact for typical GOPs.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libswscale/swscale.h>
#include <libavutil/imgutils.h>
}

#include <algorithm>
#include <cstring>
#include <mutex>
#include <string>
#include <vector>

namespace {

thread_local std::string g_last_error;

void set_error(const std::string& msg) { g_last_error = msg; }

constexpr int kSeekThreshold = 64;  // frames; beyond this, av_seek_frame

struct Reader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  int stream_index = -1;
  int64_t num_frames = 0;
  double avg_fps = 30.0;
  // native and output geometry
  int src_w = 0, src_h = 0;
  int out_w = 0, out_h = 0;
  // decode cursor: index of the NEXT frame the decoder will emit
  int64_t next_frame = 0;
  bool eof_sent = false;

  ~Reader() {
    if (sws) sws_freeContext(sws);
    if (frame) av_frame_free(&frame);
    if (pkt) av_packet_free(&pkt);
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
  }
};

int64_t estimate_num_frames(AVFormatContext* fmt, AVStream* st) {
  if (st->nb_frames > 0) return st->nb_frames;
  double fps = av_q2d(st->avg_frame_rate);
  if (fps <= 0) fps = av_q2d(st->r_frame_rate);
  if (fps <= 0) fps = 30.0;
  if (st->duration > 0)
    return (int64_t)(st->duration * av_q2d(st->time_base) * fps + 0.5);
  if (fmt->duration > 0)
    return (int64_t)((double)fmt->duration / AV_TIME_BASE * fps + 0.5);
  return 0;
}

// Drain one decoded frame; returns 1 on frame, 0 on EOF, <0 on error.
int decode_next(Reader* r) {
  while (true) {
    int ret = avcodec_receive_frame(r->codec, r->frame);
    if (ret == 0) return 1;
    if (ret == AVERROR_EOF) return 0;
    if (ret != AVERROR(EAGAIN)) return ret;
    if (r->eof_sent) return 0;
    // feed more packets
    while (true) {
      ret = av_read_frame(r->fmt, r->pkt);
      if (ret == AVERROR_EOF) {
        avcodec_send_packet(r->codec, nullptr);
        r->eof_sent = true;
        break;
      }
      if (ret < 0) return ret;
      if (r->pkt->stream_index == r->stream_index) {
        ret = avcodec_send_packet(r->codec, r->pkt);
        av_packet_unref(r->pkt);
        if (ret < 0 && ret != AVERROR(EAGAIN)) return ret;
        break;
      }
      av_packet_unref(r->pkt);
    }
  }
}

int64_t frame_index_of_pts(Reader* r, int64_t pts) {
  AVStream* st = r->fmt->streams[r->stream_index];
  double fps = r->avg_fps;
  double sec = (pts - (st->start_time == AV_NOPTS_VALUE ? 0 : st->start_time))
               * av_q2d(st->time_base);
  return (int64_t)(sec * fps + 0.5);
}

int seek_to(Reader* r, int64_t target) {
  AVStream* st = r->fmt->streams[r->stream_index];
  double fps = r->avg_fps;
  int64_t start = st->start_time == AV_NOPTS_VALUE ? 0 : st->start_time;
  int64_t ts = start + (int64_t)((double)target / fps / av_q2d(st->time_base) + 0.5);
  int ret = av_seek_frame(r->fmt, r->stream_index, ts, AVSEEK_FLAG_BACKWARD);
  if (ret < 0) return ret;
  avcodec_flush_buffers(r->codec);
  r->eof_sent = false;
  // we don't know the exact frame index post-seek until a frame arrives;
  // mark unknown with -1 and fix up in get_frames
  r->next_frame = -1;
  return 0;
}

int convert_out(Reader* r, uint8_t* dst) {
  uint8_t* dst_data[4] = {dst, nullptr, nullptr, nullptr};
  int dst_linesize[4] = {r->out_w * 3, 0, 0, 0};
  sws_scale(r->sws, r->frame->data, r->frame->linesize, 0, r->src_h,
            dst_data, dst_linesize);
  return 0;
}

}  // namespace

extern "C" {

const char* aim_last_error() { return g_last_error.c_str(); }

void* aim_open(const char* path, int short_side) {
  auto r = new Reader();
  av_log_set_level(AV_LOG_ERROR);
  if (avformat_open_input(&r->fmt, path, nullptr, nullptr) < 0) {
    set_error(std::string("cannot open ") + path);
    delete r;
    return nullptr;
  }
  if (avformat_find_stream_info(r->fmt, nullptr) < 0) {
    set_error("no stream info");
    delete r;
    return nullptr;
  }
  const AVCodec* dec = nullptr;
  r->stream_index =
      av_find_best_stream(r->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
  if (r->stream_index < 0 || !dec) {
    set_error("no video stream / decoder");
    delete r;
    return nullptr;
  }
  AVStream* st = r->fmt->streams[r->stream_index];
  r->codec = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(r->codec, st->codecpar);
  r->codec->thread_count = 0;  // auto
  if (avcodec_open2(r->codec, dec, nullptr) < 0) {
    set_error("cannot open codec");
    delete r;
    return nullptr;
  }
  r->frame = av_frame_alloc();
  r->pkt = av_packet_alloc();
  r->src_w = r->codec->width;
  r->src_h = r->codec->height;
  double fps = av_q2d(st->avg_frame_rate);
  if (fps <= 0) fps = av_q2d(st->r_frame_rate);
  if (fps <= 0) fps = 30.0;
  r->avg_fps = fps;
  r->num_frames = estimate_num_frames(r->fmt, st);

  if (short_side > 0 && std::min(r->src_w, r->src_h) != short_side) {
    if (r->src_h < r->src_w) {
      r->out_h = short_side;
      r->out_w = (int)((int64_t)r->src_w * short_side / r->src_h);
    } else {
      r->out_w = short_side;
      r->out_h = (int)((int64_t)r->src_h * short_side / r->src_w);
    }
  } else {
    r->out_w = r->src_w;
    r->out_h = r->src_h;
  }
  r->sws = sws_getContext(r->src_w, r->src_h, r->codec->pix_fmt, r->out_w,
                          r->out_h, AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr,
                          nullptr, nullptr);
  if (!r->sws) {
    set_error("cannot create scaler");
    delete r;
    return nullptr;
  }
  return r;
}

long aim_num_frames(void* h) {
  return (long)((Reader*)h)->num_frames;
}

double aim_avg_fps(void* h) { return ((Reader*)h)->avg_fps; }

int aim_frame_size(void* h, int* height, int* width) {
  auto r = (Reader*)h;
  *height = r->out_h;
  *width = r->out_w;
  return 0;
}

// indices must be ascending & unique; out: n * out_h * out_w * 3 bytes.
int aim_get_frames(void* h, const long* indices, int n, uint8_t* out) {
  auto r = (Reader*)h;
  const size_t frame_bytes = (size_t)r->out_h * r->out_w * 3;
  int64_t last_decoded = -1;
  size_t last_out = (size_t)-1;

  for (int i = 0; i < n; ++i) {
    int64_t target = indices[i];
    if (target < 0) { set_error("negative frame index"); return -1; }
    if (i > 0 && target <= indices[i - 1]) {
      set_error("indices must be strictly ascending");
      return -2;
    }
    bool need_seek =
        (r->next_frame < 0) ||
        (target < r->next_frame) ||
        (target - r->next_frame > kSeekThreshold);
    if (need_seek && target != r->next_frame) {
      if (seek_to(r, target) < 0) {
        set_error("seek failed");
        return -3;
      }
    }
    // roll forward until we hold frame `target`
    while (true) {
      int ret = decode_next(r);
      if (ret <= 0) {
        // EOF before reaching target (container over-reported length):
        // repeat the last successfully decoded frame, decord-style.
        if (last_decoded >= 0) {
          std::memcpy(out + (size_t)i * frame_bytes, out + last_out,
                      frame_bytes);
          break;
        }
        set_error("decode failed before first requested frame");
        return -4;
      }
      int64_t idx;
      if (r->next_frame >= 0) {
        idx = r->next_frame;
      } else {
        // first frame after a seek: derive its index from pts
        int64_t pts = r->frame->best_effort_timestamp;
        idx = pts == AV_NOPTS_VALUE ? target : frame_index_of_pts(r, pts);
        if (idx > target) idx = target;  // container jitter: accept
      }
      r->next_frame = idx + 1;
      if (idx >= target) {
        convert_out(r, out + (size_t)i * frame_bytes);
        last_decoded = idx;
        last_out = (size_t)i * frame_bytes;
        break;
      }
    }
  }
  return 0;
}

void aim_close(void* h) { delete (Reader*)h; }

}  // extern "C"
