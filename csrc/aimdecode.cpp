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
#include <libavutil/pixdesc.h>
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
  // crop-path scaler, cached on (crop_w, crop_h, out_w, out_h, pix_fmt)
  SwsContext* crop_sws = nullptr;
  int crop_key[5] = {0, 0, 0, 0, -1};
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
  // diagnostics: cumulative decoded frames / seeks (aim_stats)
  int64_t stat_decoded = 0;
  int64_t stat_seeks = 0;

  ~Reader() {
    if (sws) sws_freeContext(sws);
    if (crop_sws) sws_freeContext(crop_sws);
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

int64_t pts_of_frame_index(Reader* r, int64_t index) {
  AVStream* st = r->fmt->streams[r->stream_index];
  int64_t start = st->start_time == AV_NOPTS_VALUE ? 0 : st->start_time;
  return start + (int64_t)((double)index / r->avg_fps / av_q2d(st->time_base) + 0.5);
}

// Frame index of the keyframe at/before `target`, from the container's own
// sample index (mp4 stss & friends); -1 when the index is absent/unusable.
// This makes the seek-vs-roll decision exact: seeking is profitable iff the
// landing keyframe lies beyond the current decode cursor.
int64_t keyframe_before(Reader* r, int64_t target) {
  AVStream* st = r->fmt->streams[r->stream_index];
  int entry = av_index_search_timestamp(st, pts_of_frame_index(r, target),
                                        AVSEEK_FLAG_BACKWARD);
  if (entry < 0) return -1;
  const AVIndexEntry* e = avformat_index_get_entry(st, entry);
  if (!e) return -1;
  double sec = (e->timestamp -
                (st->start_time == AV_NOPTS_VALUE ? 0 : st->start_time)) *
               av_q2d(st->time_base);
  return (int64_t)(sec * r->avg_fps + 0.5);
}

int64_t frame_index_of_pts(Reader* r, int64_t pts) {
  AVStream* st = r->fmt->streams[r->stream_index];
  double fps = r->avg_fps;
  double sec = (pts - (st->start_time == AV_NOPTS_VALUE ? 0 : st->start_time))
               * av_q2d(st->time_base);
  return (int64_t)(sec * fps + 0.5);
}

// Rolling forward decodes (target - cursor) frames; seeking decodes
// (target - keyframe) frames plus flush/reparse overhead worth roughly
// this many cheap decodes. Overridable for diagnostics via
// AIMDECODE_SEEK_MARGIN.
int seek_margin() {
  static int margin = [] {
    const char* e = getenv("AIMDECODE_SEEK_MARGIN");
    return e ? atoi(e) : 16;
  }();
  return margin;
}

int seek_to(Reader* r, int64_t target) {
  AVStream* st = r->fmt->streams[r->stream_index];
  double fps = r->avg_fps;
  int64_t start = st->start_time == AV_NOPTS_VALUE ? 0 : st->start_time;
  int64_t ts = start + (int64_t)((double)target / fps / av_q2d(st->time_base) + 0.5);
  int ret = av_seek_frame(r->fmt, r->stream_index, ts, AVSEEK_FLAG_BACKWARD);
  if (ret < 0) return ret;
  r->stat_seeks++;
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

// ---- fused crop+scale conversion (the FusedDecordInit fast_rrc/rcc path) --

struct CropSpec {
  int x0 = 0, y0 = 0, cw = 0, ch = 0;  // source crop (chroma-aligned)
  int ow = 0, oh = 0;                  // output size
  bool hflip = false;
};

// Plane-pointer crop is only valid for formats with 1 byte per sample per
// plane (covers yuv420p/yuvj420p/422/444, gray8 — virtually all video).
bool crop_supported(AVPixelFormat fmt) {
  const AVPixFmtDescriptor* d = av_pix_fmt_desc_get(fmt);
  if (!d || (d->flags & (AV_PIX_FMT_FLAG_BITSTREAM | AV_PIX_FMT_FLAG_PAL)))
    return false;
  for (int c = 0; c < d->nb_components; ++c) {
    if (d->comp[c].depth != 8 || d->comp[c].step != 1) return false;
  }
  return true;
}

int convert_out_crop(Reader* r, const CropSpec& s, uint8_t* dst) {
  AVPixelFormat fmt = (AVPixelFormat)r->frame->format;
  // a mid-stream format change to something un-croppable must surface as
  // the documented rc=-6 so the caller takes the host fallback
  if (!crop_supported(fmt)) return -6;
  const AVPixFmtDescriptor* d = av_pix_fmt_desc_get(fmt);
  if (!r->crop_sws || r->crop_key[0] != s.cw || r->crop_key[1] != s.ch ||
      r->crop_key[2] != s.ow || r->crop_key[3] != s.oh ||
      r->crop_key[4] != (int)fmt) {
    if (r->crop_sws) sws_freeContext(r->crop_sws);
    r->crop_sws = sws_getContext(s.cw, s.ch, fmt, s.ow, s.oh,
                                 AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr,
                                 nullptr, nullptr);
    if (!r->crop_sws) return -1;
    r->crop_key[0] = s.cw; r->crop_key[1] = s.ch;
    r->crop_key[2] = s.ow; r->crop_key[3] = s.oh;
    r->crop_key[4] = (int)fmt;
  }
  const uint8_t* src_data[4] = {nullptr, nullptr, nullptr, nullptr};
  for (int p = 0; p < 4 && r->frame->data[p]; ++p) {
    int sx = (p == 1 || p == 2) ? d->log2_chroma_w : 0;
    int sy = (p == 1 || p == 2) ? d->log2_chroma_h : 0;
    src_data[p] = r->frame->data[p] +
                  (ptrdiff_t)(s.y0 >> sy) * r->frame->linesize[p] +
                  (s.x0 >> sx);
  }
  uint8_t* dst_data[4] = {dst, nullptr, nullptr, nullptr};
  int dst_linesize[4] = {s.ow * 3, 0, 0, 0};
  sws_scale(r->crop_sws, src_data, r->frame->linesize, 0, s.ch, dst_data,
            dst_linesize);
  if (s.hflip) {
    for (int y = 0; y < s.oh; ++y) {
      uint8_t* row = dst + (size_t)y * s.ow * 3;
      for (int xl = 0, xr = s.ow - 1; xl < xr; ++xl, --xr) {
        for (int c = 0; c < 3; ++c)
          std::swap(row[xl * 3 + c], row[xr * 3 + c]);
      }
    }
  }
  return 0;
}

// Shared decode-advance loop: fetch `indices` (strictly ascending) and
// convert each target with `convert` into out + i*frame_bytes; on EOF
// before a target, repeat the last decoded frame (decord semantics).
template <typename ConvertFn>
int fetch_frames(Reader* r, const long* indices, int n, size_t frame_bytes,
                 uint8_t* out, ConvertFn convert) {
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
    if (!need_seek && target > r->next_frame) {
      // decision from the container's keyframe index: seek when the
      // keyframe at/before `target` is far enough ahead of the decode
      // cursor that the saved decodes outweigh flush/reparse overhead
      int64_t kf = keyframe_before(r, target);
      if (kf > r->next_frame + seek_margin()) need_seek = true;
    }
    if (need_seek && target != r->next_frame) {
      if (seek_to(r, target) < 0) {
        set_error("seek failed");
        return -3;
      }
    }
    // roll forward until we hold frame `target`
    while (true) {
      int ret = decode_next(r);
      if (ret > 0) r->stat_decoded++;
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
        int cv = convert(r, out + (size_t)i * frame_bytes);
        if (cv < 0) {
          set_error("frame conversion failed");
          return cv == -6 ? -6 : -5;  // -6 = take the host fallback
        }
        last_decoded = idx;
        last_out = (size_t)i * frame_bytes;
        break;
      }
    }
  }
  return 0;
}

}  // namespace

extern "C" {

const char* aim_last_error() { return g_last_error.c_str(); }

void* aim_open(const char* path, int short_side) {
  auto r = new Reader();
  // QUIET, not ERROR: corrupt inputs make FFmpeg print raw (often
  // non-UTF-8) bytes on stderr, which breaks text-mode callers such as
  // tools/analysis/check_videos.py. Errors are reported via
  // aim_last_error() instead; AIMDECODE_LOG=1 restores FFmpeg's own log.
  if (!getenv("AIMDECODE_LOG")) av_log_set_level(AV_LOG_QUIET);
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
  return fetch_frames(r, indices, n, frame_bytes, out,
                      [](Reader* rr, uint8_t* dst) {
                        return convert_out(rr, dst);
                      });
}

// Fused decode + crop + scale (+ optional hflip): the FusedDecordInit
// fast_rrc/fast_rcc path (reference loading.py:1678-1753; the fork's
// patched-decord use_rrc/use_rcc). Crop box (x0, y0)-(x1, y1) is in native
// decoded coordinates (open with short_side=0); x0/y0 are aligned down to
// the chroma grid. out: n * out_h * out_w * 3 bytes.
// Returns -6 when the stream's pixel format cannot be plane-cropped —
// the caller should fall back to aim_get_frames + host crop/resize.
int aim_get_frames_crop(void* h, const long* indices, int n, int x0, int y0,
                        int x1, int y1, int out_w, int out_h, int hflip,
                        uint8_t* out) {
  auto r = (Reader*)h;
  if (!crop_supported(r->codec->pix_fmt)) {
    set_error("pixel format does not support plane cropping");
    return -6;
  }
  CropSpec s;
  const AVPixFmtDescriptor* d = av_pix_fmt_desc_get(r->codec->pix_fmt);
  int ax = (1 << d->log2_chroma_w) - 1, ay = (1 << d->log2_chroma_h) - 1;
  s.x0 = x0 & ~ax;
  s.y0 = y0 & ~ay;
  s.cw = x1 - s.x0;
  s.ch = y1 - s.y0;
  s.ow = out_w;
  s.oh = out_h;
  s.hflip = hflip != 0;
  if (s.cw <= 0 || s.ch <= 0 || s.x0 + s.cw > r->src_w ||
      s.y0 + s.ch > r->src_h || out_w <= 0 || out_h <= 0) {
    set_error("invalid crop box");
    return -7;
  }
  const size_t frame_bytes = (size_t)out_h * out_w * 3;
  return fetch_frames(r, indices, n, frame_bytes, out,
                      [&s](Reader* rr, uint8_t* dst) {
                        return convert_out_crop(rr, s, dst);
                      });
}

// diagnostics: cumulative (decoded frames, seeks) since open
int aim_stats(void* h, long* decoded, long* seeks) {
  auto r = (Reader*)h;
  *decoded = (long)r->stat_decoded;
  *seeks = (long)r->stat_seeks;
  return 0;
}

void aim_close(void* h) { delete (Reader*)h; }

}  // extern "C"
