// Minimal spdlog-compatible shim — just enough API surface to compile the
// reference CLI (/root/reference/src, which consumes spdlog only through
// src/util/{logger,spdlog_levels,callback_sink}.hpp) in this offline
// environment, where the real spdlog cannot be fetched. Formatting is a
// naive "{}" substitution; log text fidelity is irrelevant to the oracle
// (we only consume the rendered images and [BENCHMARK] stdout lines, which
// go through printf/cout, not spdlog).
//
// Original code; no spdlog sources were available or consulted beyond the
// public API names used by the reference.
#ifndef LUMICE_SHIM_SPDLOG_H_
#define LUMICE_SHIM_SPDLOG_H_

#include <cstdio>
#include <ctime>
#include <memory>
#include <mutex>
#include <sstream>
#include <string>
#include <string_view>
#include <vector>

namespace spdlog {

namespace level {
enum level_enum : int { trace = 0, debug = 1, info = 2, warn = 3, err = 4, critical = 5, off = 6, n_levels };
}  // namespace level

// Tiny byte buffer standing in for fmt::memory_buffer.
struct memory_buf_t {
  std::string s;
  void push_back(char c) { s.push_back(c); }
  void append(const char* b, const char* e) { s.append(b, e); }
  const char* data() const { return s.data(); }
  size_t size() const { return s.size(); }
};

namespace details {
struct log_msg {
  level::level_enum level = level::info;
  std::string_view logger_name;
  std::string_view payload;
};
}  // namespace details

// ---- formatting: naive "{}" / "{:spec}" placeholder substitution ----------
namespace detail {
inline void append_one(std::ostringstream& os, std::string_view fmt, size_t& pos) {
  // copy until next "{...}" placeholder (or end)
  while (pos < fmt.size()) {
    char c = fmt[pos];
    if (c == '{' && pos + 1 < fmt.size() && fmt[pos + 1] == '{') {
      os << '{';
      pos += 2;
    } else if (c == '}' && pos + 1 < fmt.size() && fmt[pos + 1] == '}') {
      os << '}';
      pos += 2;
    } else if (c == '{') {
      // skip to matching '}'
      while (pos < fmt.size() && fmt[pos] != '}') pos++;
      if (pos < fmt.size()) pos++;  // consume '}'
      return;                       // caller streams the arg here
    } else {
      os << c;
      pos++;
    }
  }
}

inline void format_rec(std::ostringstream& os, std::string_view fmt, size_t& pos) {
  append_one(os, fmt, pos);
  // no more args: copy the rest verbatim
  while (pos < fmt.size()) {
    os << fmt[pos];
    pos++;
  }
}

template <typename A, typename... Rest>
void format_rec(std::ostringstream& os, std::string_view fmt, size_t& pos, A&& a, Rest&&... rest) {
  append_one(os, fmt, pos);
  os << a;
  format_rec(os, fmt, pos, std::forward<Rest>(rest)...);
}
}  // namespace detail

template <typename... Args>
std::string shim_format(std::string_view fmt, Args&&... args) {
  std::ostringstream os;
  size_t pos = 0;
  detail::format_rec(os, fmt, pos, std::forward<Args>(args)...);
  return os.str();
}

// ---- formatter hierarchy ---------------------------------------------------
class formatter {
 public:
  virtual ~formatter() = default;
  virtual void format(const details::log_msg& msg, memory_buf_t& dest) = 0;
};

class custom_flag_formatter {
 public:
  virtual ~custom_flag_formatter() = default;
  virtual void format(const details::log_msg& msg, const std::tm& t, memory_buf_t& dest) = 0;
  virtual std::unique_ptr<custom_flag_formatter> clone() const = 0;
};

class pattern_formatter : public formatter {
 public:
  struct FlagProxy {
    pattern_formatter* pf;
    void set_pattern(const std::string& p) { pf->pattern_ = p; }
  };

  template <typename T>
  FlagProxy add_flag(char flag) {
    flags_.emplace_back(flag, std::make_unique<T>());
    return FlagProxy{this};
  }

  void format(const details::log_msg& msg, memory_buf_t& dest) override {
    // Honors only the flags the reference pattern uses: %* (custom), %v.
    std::tm t{};
    std::time_t now = std::time(nullptr);
#if defined(_WIN32)
    localtime_s(&t, &now);
#else
    localtime_r(&now, &t);
#endif
    for (size_t i = 0; i < pattern_.size(); ++i) {
      char c = pattern_[i];
      if (c != '%' || i + 1 >= pattern_.size()) {
        dest.push_back(c);
        continue;
      }
      char f = pattern_[++i];
      if (f == 'v') {
        dest.append(msg.payload.data(), msg.payload.data() + msg.payload.size());
      } else {
        bool handled = false;
        for (auto& kv : flags_) {
          if (kv.first == f) {
            kv.second->format(msg, t, dest);
            handled = true;
            break;
          }
        }
        if (!handled) {
          // unknown flag (timestamps etc.): drop — log cosmetics only
        }
      }
    }
    dest.push_back('\n');
  }

 private:
  std::string pattern_;
  std::vector<std::pair<char, std::unique_ptr<custom_flag_formatter>>> flags_;
};

// ---- sinks -----------------------------------------------------------------
namespace sinks {

class sink {
 public:
  virtual ~sink() = default;
  virtual void log(const details::log_msg& msg) = 0;
  virtual void flush() = 0;
  virtual void set_formatter(std::unique_ptr<formatter> f) = 0;
};

template <typename Mutex>
class base_sink : public sink {
 public:
  void log(const details::log_msg& msg) override {
    std::lock_guard<Mutex> lock(mutex_);
    sink_it_(msg);
  }
  void flush() override {
    std::lock_guard<Mutex> lock(mutex_);
    flush_();
  }
  void set_formatter(std::unique_ptr<formatter> f) override {
    std::lock_guard<Mutex> lock(mutex_);
    formatter_ = std::move(f);
  }

 protected:
  virtual void sink_it_(const details::log_msg& msg) = 0;
  virtual void flush_() = 0;
  Mutex mutex_;
  std::unique_ptr<formatter> formatter_;
};

}  // namespace sinks

// ---- logger ----------------------------------------------------------------
class logger {
 public:
  logger(std::string name, std::shared_ptr<sinks::sink> sink)
      : name_(std::move(name)), sink_(std::move(sink)) {}

  void set_level(level::level_enum lvl) { level_ = lvl; }
  level::level_enum level() const { return level_; }
  bool should_log(level::level_enum lvl) const { return lvl >= level_ && lvl < level::off; }
  void set_formatter(std::unique_ptr<formatter> f) {
    if (sink_) sink_->set_formatter(std::move(f));
  }

  template <typename... Args>
  void log(level::level_enum lvl, std::string_view fmt, Args&&... args) {
    if (!should_log(lvl) || !sink_) return;
    std::string text = shim_format(fmt, std::forward<Args>(args)...);
    details::log_msg msg;
    msg.level = lvl;
    msg.logger_name = name_;
    msg.payload = text;
    sink_->log(msg);
  }

  template <typename... Args>
  void trace(std::string_view f, Args&&... a) { log(level::trace, f, std::forward<Args>(a)...); }
  template <typename... Args>
  void debug(std::string_view f, Args&&... a) { log(level::debug, f, std::forward<Args>(a)...); }
  template <typename... Args>
  void info(std::string_view f, Args&&... a) { log(level::info, f, std::forward<Args>(a)...); }
  template <typename... Args>
  void warn(std::string_view f, Args&&... a) { log(level::warn, f, std::forward<Args>(a)...); }
  template <typename... Args>
  void error(std::string_view f, Args&&... a) { log(level::err, f, std::forward<Args>(a)...); }
  template <typename... Args>
  void critical(std::string_view f, Args&&... a) { log(level::critical, f, std::forward<Args>(a)...); }

 private:
  std::string name_;
  std::shared_ptr<sinks::sink> sink_;
  level::level_enum level_ = level::info;
};

}  // namespace spdlog

// SPDLOG_LOGGER_* macros (level-remapped by the reference's logger.hpp).
#define SPDLOG_LOGGER_CALL_SHIM(lg, lvl, ...) \
  do {                                        \
    if ((lg)) (lg)->log(lvl, __VA_ARGS__);    \
  } while (0)
#define SPDLOG_LOGGER_TRACE(lg, ...) SPDLOG_LOGGER_CALL_SHIM(lg, spdlog::level::trace, __VA_ARGS__)
#define SPDLOG_LOGGER_DEBUG(lg, ...) SPDLOG_LOGGER_CALL_SHIM(lg, spdlog::level::debug, __VA_ARGS__)
#define SPDLOG_LOGGER_INFO(lg, ...) SPDLOG_LOGGER_CALL_SHIM(lg, spdlog::level::info, __VA_ARGS__)
#define SPDLOG_LOGGER_WARN(lg, ...) SPDLOG_LOGGER_CALL_SHIM(lg, spdlog::level::warn, __VA_ARGS__)
#define SPDLOG_LOGGER_ERROR(lg, ...) SPDLOG_LOGGER_CALL_SHIM(lg, spdlog::level::err, __VA_ARGS__)
#define SPDLOG_LOGGER_CRITICAL(lg, ...) SPDLOG_LOGGER_CALL_SHIM(lg, spdlog::level::critical, __VA_ARGS__)

// fmt::ptr — the one fmt helper the reference's non-GUI code uses.
namespace fmt {
inline const void* ptr(const void* p) { return p; }
}  // namespace fmt

#endif  // LUMICE_SHIM_SPDLOG_H_
