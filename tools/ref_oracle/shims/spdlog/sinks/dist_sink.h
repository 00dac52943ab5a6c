#pragma once
#include <spdlog/spdlog.h>

#include <algorithm>
#include <memory>
#include <mutex>
#include <vector>

namespace spdlog { namespace sinks {

// Fan-out sink: forwards every record to all registered child sinks.
template <typename Mutex>
class dist_sink : public base_sink<Mutex> {
 public:
  void add_sink(std::shared_ptr<sink> s) {
    std::lock_guard<Mutex> lock(this->mutex_);
    sinks_.push_back(std::move(s));
  }
  void remove_sink(std::shared_ptr<sink> s) {
    std::lock_guard<Mutex> lock(this->mutex_);
    sinks_.erase(std::remove(sinks_.begin(), sinks_.end(), s), sinks_.end());
  }

 protected:
  void sink_it_(const details::log_msg& msg) override {
    for (auto& s : sinks_) s->log(msg);
  }
  void flush_() override {
    for (auto& s : sinks_) s->flush();
  }
  std::vector<std::shared_ptr<sink>> sinks_;
};

using dist_sink_mt = dist_sink<std::mutex>;

}}  // namespace spdlog::sinks
