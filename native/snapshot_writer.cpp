// Asynchronous double-buffered snapshot writer.
//
// Native IO component of the framework (the role the reference assigns to
// its MemoryManager streams + declared-but-missing output managers,
// ref: medical gpu_adaptability.cpp:956-1005 stream create/sync;
// weather output_manager.hpp:51-429 header-only writers): the simulation
// thread enqueues a snapshot buffer and continues; a background thread
// writes it to disk. Bounded queue -> bounded memory.

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Snapshot {
    std::string path;
    std::vector<float> data;
    int64_t step;
};

class Writer {
  public:
    explicit Writer(size_t max_queue) : max_queue_(max_queue) {
        thread_ = std::thread([this] { loop(); });
    }

    ~Writer() { stop(); }

    bool enqueue(const char* path, const float* data, int64_t count,
                 int64_t step) {
        std::unique_lock<std::mutex> lk(mu_);
        if (stopping_) return false;
        // backpressure: block while the queue is full (bounded memory)
        cv_space_.wait(lk, [this] {
            return queue_.size() < max_queue_ || stopping_;
        });
        if (stopping_) return false;
        Snapshot s;
        s.path = path;
        s.data.assign(data, data + count);
        s.step = step;
        queue_.push(std::move(s));
        cv_work_.notify_one();
        return true;
    }

    void flush() {
        std::unique_lock<std::mutex> lk(mu_);
        cv_space_.wait(lk, [this] { return queue_.empty() && !writing_; });
    }

    void stop() {
        {
            std::lock_guard<std::mutex> lk(mu_);
            if (stopping_) return;
            stopping_ = true;
        }
        cv_work_.notify_all();
        cv_space_.notify_all();
        if (thread_.joinable()) thread_.join();
    }

    int64_t written() const { return written_; }

  private:
    void loop() {
        for (;;) {
            Snapshot s;
            {
                std::unique_lock<std::mutex> lk(mu_);
                cv_work_.wait(lk, [this] {
                    return !queue_.empty() || stopping_;
                });
                if (queue_.empty()) return;  // stopping
                s = std::move(queue_.front());
                queue_.pop();
                writing_ = true;
            }
            write_one(s);
            {
                std::lock_guard<std::mutex> lk(mu_);
                writing_ = false;
                ++written_;
            }
            cv_space_.notify_all();
        }
    }

    static void write_one(const Snapshot& s) {
        std::FILE* f = std::fopen(s.path.c_str(), "wb");
        if (!f) return;
        const int64_t header[2] = {s.step,
                                   (int64_t)s.data.size()};
        std::fwrite(header, sizeof(int64_t), 2, f);
        std::fwrite(s.data.data(), sizeof(float), s.data.size(), f);
        std::fclose(f);
    }

    size_t max_queue_;
    std::queue<Snapshot> queue_;
    std::mutex mu_;
    std::condition_variable cv_work_, cv_space_;
    std::thread thread_;
    bool stopping_ = false;
    bool writing_ = false;
    int64_t written_ = 0;
};

}  // namespace

extern "C" {

void* snapshot_writer_create(int64_t max_queue) {
    return new Writer((size_t)max_queue);
}

int32_t snapshot_writer_enqueue(void* w, const char* path,
                                const float* data, int64_t count,
                                int64_t step) {
    return static_cast<Writer*>(w)->enqueue(path, data, count, step) ? 1 : 0;
}

void snapshot_writer_flush(void* w) { static_cast<Writer*>(w)->flush(); }

int64_t snapshot_writer_written(void* w) {
    return static_cast<Writer*>(w)->written();
}

void snapshot_writer_destroy(void* w) { delete static_cast<Writer*>(w); }

}  // extern "C"
