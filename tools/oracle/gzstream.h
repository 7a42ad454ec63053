/* Shim replacement for the gzstream library header used by the reference
 * (fetched over the network by its build).  Minimal zlib-backed iostream
 * wrappers sufficient for the LMAT apps (getline/>> on igzstream, << on
 * ogzstream). */
#ifndef GZSTREAM_SHIM_H
#define GZSTREAM_SHIM_H

#include <zlib.h>

#include <cstring>
#include <istream>
#include <ostream>
#include <streambuf>

class gzstreambuf : public std::streambuf {
  public:
    gzstreambuf() : m_file(nullptr) {}
    ~gzstreambuf() { close(); }

    gzstreambuf *open(const char *name, int open_mode) {
        if (m_file) return nullptr;
        m_mode = open_mode;
        const char *fmode = (open_mode & std::ios::out) ? "wb" : "rb";
        m_file = gzopen(name, fmode);
        if (!m_file) return nullptr;
        setp(m_obuf, m_obuf + BUF - 1);
        setg(m_ibuf, m_ibuf + BUF, m_ibuf + BUF);
        return this;
    }

    gzstreambuf *close() {
        if (!m_file) return nullptr;
        sync();
        gzclose(m_file);
        m_file = nullptr;
        return this;
    }

    bool is_open() const { return m_file != nullptr; }

  protected:
    int underflow() override {
        if (gptr() < egptr()) return traits_type::to_int_type(*gptr());
        if (!m_file) return traits_type::eof();
        int n = gzread(m_file, m_ibuf, BUF);
        if (n <= 0) return traits_type::eof();
        setg(m_ibuf, m_ibuf, m_ibuf + n);
        return traits_type::to_int_type(*gptr());
    }

    int overflow(int c) override {
        if (!m_file) return traits_type::eof();
        if (c != traits_type::eof()) {
            *pptr() = (char)c;
            pbump(1);
        }
        return flush_out() ? c : traits_type::eof();
    }

    int sync() override {
        if (pptr() > pbase() && !flush_out()) return -1;
        return 0;
    }

  private:
    bool flush_out() {
        int n = (int)(pptr() - pbase());
        if (n > 0) {
            if (gzwrite(m_file, pbase(), n) != n) return false;
            pbump(-n);
        }
        return true;
    }

    static const int BUF = 65536;
    gzFile m_file;
    int m_mode = 0;
    char m_ibuf[BUF];
    char m_obuf[BUF];
};

class igzstream : public std::istream {
  public:
    igzstream() : std::istream(&m_buf) {}
    explicit igzstream(const char *name, int mode = std::ios::in)
        : std::istream(&m_buf) {
        open(name, mode);
    }
    void open(const char *name, int mode = std::ios::in) {
        if (!m_buf.open(name, mode)) clear(rdstate() | std::ios::badbit);
    }
    void close() { m_buf.close(); }
    bool is_open() const { return m_buf.is_open(); }

  private:
    gzstreambuf m_buf;
};

class ogzstream : public std::ostream {
  public:
    ogzstream() : std::ostream(&m_buf) {}
    explicit ogzstream(const char *name, int mode = std::ios::out)
        : std::ostream(&m_buf) {
        open(name, mode);
    }
    void open(const char *name, int mode = std::ios::out) {
        if (!m_buf.open(name, mode)) clear(rdstate() | std::ios::badbit);
    }
    void close() { m_buf.close(); }
    bool is_open() const { return m_buf.is_open(); }

  private:
    gzstreambuf m_buf;
};

#endif
