#pragma once
#include <spdlog/spdlog.h>

#include <cstdio>
#include <mutex>

namespace spdlog { namespace sinks {

// Plain stdout sink (no color in the shim).
template <typename Mutex>
class stdout_color_sink : public base_sink<Mutex> {
 protected:
  void sink_it_(const details::log_msg& msg) override {
    if (this->formatter_) {
      memory_buf_t buf;
      this->formatter_->format(msg, buf);
      std::fwrite(buf.data(), 1, buf.size(), stdout);
    } else {
      std::fwrite(msg.payload.data(), 1, msg.payload.size(), stdout);
      std::fputc('\n', stdout);
    }
  }
  void flush_() override { std::fflush(stdout); }
};

using stdout_color_sink_mt = stdout_color_sink<std::mutex>;

}}  // namespace spdlog::sinks
