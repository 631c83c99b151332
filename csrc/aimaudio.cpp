// aimaudio — audio-track extraction to 16-bit PCM WAV.
//
// TPU-native replacement for the reference's ffmpeg-CLI audio extraction
// (tools/data/extract_audio.py: `ffmpeg -i <video> -map 0:a <id>.wav`):
// decodes the first audio stream with libavcodec, resamples to a target
// rate / mono with libswresample, and writes a canonical RIFF WAV. Used by
// tools/data/extract_audio.py through the ctypes binding in
// adapt_image_models_tpu/data/cpp_decoder.py.
//
// C API:
//   int aim_extract_audio(const char* path, const char* out_wav,
//                         int sample_rate, int mono);
//     sample_rate 0 = keep source rate; mono 0 = keep channel count (max 2).
//     Returns 0 on success, <0 on error (message via aim_last_error()).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libswresample/swresample.h>
#include <libavutil/opt.h>
}

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" const char* aim_last_error();

namespace {

// shared with aimdecode.cpp (same thread_local pattern; distinct TU copy is
// fine — aim_last_error() in aimdecode.cpp reads its own, so keep a local
// error reporter here instead)
thread_local std::string g_audio_error;

void set_aerror(const std::string& msg) { g_audio_error = msg; }

void wav_write_header(FILE* f, int sample_rate, int channels,
                      uint32_t data_bytes) {
  uint32_t byte_rate = (uint32_t)sample_rate * channels * 2;
  uint16_t block_align = (uint16_t)(channels * 2);
  uint32_t riff_size = 36 + data_bytes;
  fwrite("RIFF", 1, 4, f);
  fwrite(&riff_size, 4, 1, f);
  fwrite("WAVEfmt ", 1, 8, f);
  uint32_t fmt_size = 16;
  uint16_t fmt_tag = 1;  // PCM
  uint16_t ch = (uint16_t)channels;
  uint32_t sr = (uint32_t)sample_rate;
  uint16_t bits = 16;
  fwrite(&fmt_size, 4, 1, f);
  fwrite(&fmt_tag, 2, 1, f);
  fwrite(&ch, 2, 1, f);
  fwrite(&sr, 4, 1, f);
  fwrite(&byte_rate, 4, 1, f);
  fwrite(&block_align, 2, 1, f);
  fwrite(&bits, 2, 1, f);
  fwrite("data", 1, 4, f);
  fwrite(&data_bytes, 4, 1, f);
}

struct AudioCtx {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwrContext* swr = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  ~AudioCtx() {
    if (swr) swr_free(&swr);
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
    if (frame) av_frame_free(&frame);
    if (pkt) av_packet_free(&pkt);
  }
};

}  // namespace

extern "C" {

const char* aim_audio_last_error() { return g_audio_error.c_str(); }

int aim_extract_audio(const char* path, const char* out_wav,
                      int sample_rate, int mono) {
  AudioCtx c;
  if (avformat_open_input(&c.fmt, path, nullptr, nullptr) < 0) {
    set_aerror(std::string("cannot open ") + path);
    return -1;
  }
  if (avformat_find_stream_info(c.fmt, nullptr) < 0) {
    set_aerror("no stream info");
    return -1;
  }
  int aidx = av_find_best_stream(c.fmt, AVMEDIA_TYPE_AUDIO, -1, -1,
                                 nullptr, 0);
  if (aidx < 0) {
    set_aerror("no audio stream");
    return -2;
  }
  AVStream* st = c.fmt->streams[aidx];
  const AVCodec* dec = avcodec_find_decoder(st->codecpar->codec_id);
  if (!dec) {
    set_aerror("no decoder for audio codec");
    return -3;
  }
  c.codec = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(c.codec, st->codecpar);
  if (avcodec_open2(c.codec, dec, nullptr) < 0) {
    set_aerror("cannot open audio decoder");
    return -3;
  }

  int src_rate = c.codec->sample_rate;
  int out_rate = sample_rate > 0 ? sample_rate : src_rate;
  int src_ch = c.codec->ch_layout.nb_channels;
  int out_ch = mono ? 1 : (src_ch > 2 ? 2 : src_ch);

  AVChannelLayout out_layout;
  av_channel_layout_default(&out_layout, out_ch);
  AVChannelLayout in_layout;
  if (c.codec->ch_layout.order == AV_CHANNEL_ORDER_UNSPEC)
    av_channel_layout_default(&in_layout, src_ch);
  else
    av_channel_layout_copy(&in_layout, &c.codec->ch_layout);

  if (swr_alloc_set_opts2(&c.swr, &out_layout, AV_SAMPLE_FMT_S16, out_rate,
                          &in_layout, c.codec->sample_fmt, src_rate,
                          0, nullptr) < 0 ||
      swr_init(c.swr) < 0) {
    set_aerror("cannot init resampler");
    return -4;
  }

  FILE* f = fopen(out_wav, "wb");
  if (!f) {
    set_aerror(std::string("cannot write ") + out_wav);
    return -5;
  }
  wav_write_header(f, out_rate, out_ch, 0);  // patched at the end

  c.frame = av_frame_alloc();
  c.pkt = av_packet_alloc();
  std::vector<uint8_t> buf;
  uint64_t data_bytes = 0;
  bool eof = false;
  while (!eof) {
    int r = av_read_frame(c.fmt, c.pkt);
    if (r < 0) {
      avcodec_send_packet(c.codec, nullptr);  // flush
      eof = true;
    } else if (c.pkt->stream_index != aidx) {
      av_packet_unref(c.pkt);
      continue;
    } else {
      avcodec_send_packet(c.codec, c.pkt);
      av_packet_unref(c.pkt);
    }
    while (avcodec_receive_frame(c.codec, c.frame) == 0) {
      int max_out = swr_get_out_samples(c.swr, c.frame->nb_samples);
      buf.resize((size_t)max_out * out_ch * 2);
      uint8_t* outp = buf.data();
      int n = swr_convert(c.swr, &outp, max_out,
                          (const uint8_t**)c.frame->extended_data,
                          c.frame->nb_samples);
      if (n > 0) {
        fwrite(buf.data(), 1, (size_t)n * out_ch * 2, f);
        data_bytes += (uint64_t)n * out_ch * 2;
      }
    }
  }
  // drain the resampler
  for (;;) {
    int max_out = swr_get_out_samples(c.swr, 0);
    if (max_out <= 0) break;
    buf.resize((size_t)max_out * out_ch * 2);
    uint8_t* outp = buf.data();
    int n = swr_convert(c.swr, &outp, max_out, nullptr, 0);
    if (n <= 0) break;
    fwrite(buf.data(), 1, (size_t)n * out_ch * 2, f);
    data_bytes += (uint64_t)n * out_ch * 2;
  }

  fseek(f, 0, SEEK_SET);
  wav_write_header(f, out_rate, out_ch, (uint32_t)data_bytes);
  fclose(f);
  if (data_bytes == 0) {
    set_aerror("audio stream decoded to zero samples");
    return -6;
  }
  return 0;
}

}  // extern "C"
