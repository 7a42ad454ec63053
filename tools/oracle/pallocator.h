/* Shim replacement for the perm-je "jemalloc/pallocator.h" header so the
 * reference LMAT sources can be compiled locally as a validation oracle
 * (the real perm-je library is fetched over the network by the reference
 * build, which is unavailable here).  Original implementation: a persistent
 * bump-allocated heap in a file-backed mapping at a fixed address; roots
 * registered with perm() are snapshotted into the file header.
 */
#ifndef PJ_PALLOCATOR_SHIM_H
#define PJ_PALLOCATOR_SHIM_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

void *pj_malloc(size_t size);
void *pj_calloc(size_t n, size_t size);
void *pj_realloc(void *p, size_t size);
void pj_free(void *p);

int perm(void *ptr, size_t size);
int mopen(const char *fname, const char *mode, size_t size);
int mclose(void);
int mflush(void);

#ifdef __cplusplus
}
#endif

#ifdef __cplusplus
/* STL allocator over the persistent heap (the real library exposes PERM_NS). */
#include <cstddef>
namespace perm_shim_ns {
template <class T> struct allocator {
    typedef T value_type;
    typedef size_t size_type;
    typedef ptrdiff_t difference_type;
    typedef T *pointer;
    typedef const T *const_pointer;
    typedef T &reference;
    typedef const T &const_reference;
    template <class U> struct rebind { typedef allocator<U> other; };
    allocator() noexcept {}
    template <class U> allocator(const allocator<U> &) noexcept {}
    T *allocate(size_t n) { return (T *)pj_malloc(n * sizeof(T)); }
    void deallocate(T *p, size_t) { pj_free(p); }
    bool operator==(const allocator &) const { return true; }
    bool operator!=(const allocator &) const { return false; }
};
} // namespace perm_shim_ns
#define PERM_NS perm_shim_ns
#endif

#define JEMALLOC_P(x) pj_##x
#define PERM_NEW(T) new (pj_malloc(sizeof(T))) T
#define PERM_DELETE(p, T)     \
    do {                      \
        (p)->~T();            \
        pj_free((void *)(p)); \
    } while (0)

#endif
