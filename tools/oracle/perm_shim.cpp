/* Minimal persistent-heap implementation backing pallocator.h (shim).
 *
 * Layout of the heap file (mapped MAP_FIXED at BASE in every process):
 *   [Header page: magic, mapped size, bump offset, root blob sizes]
 *   [root blob area  (ROOT_AREA bytes)]
 *   [heap            (bump allocated)]
 *
 * perm(ptr,size) registers process-global root regions (in call order, which
 * must match between writer and reader — true for the LMAT apps, which
 * register a single table pointer).  mflush/mclose snapshot the root regions
 * into the blob area; mopen("r") restores them, so pointers into the heap
 * stay valid because the mapping address is fixed.
 */
#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uintptr_t BASE = 0x180000000000ULL;
constexpr uint64_t MAGIC = 0x4c4d41545348494dULL; /* "LMATSHIM" */
constexpr size_t HEADER = 4096;
constexpr size_t ROOT_AREA = 1 << 16;
constexpr int MAX_ROOTS = 16;

struct Header {
    uint64_t magic;
    uint64_t size;
    uint64_t bump; /* offset of next free byte, from BASE */
    uint64_t nroots;
    uint64_t root_size[MAX_ROOTS];
};

struct Root {
    void *ptr;
    size_t size;
};

Root g_roots[MAX_ROOTS];
int g_nroots = 0;
char *g_map = nullptr;
size_t g_size = 0;
int g_fd = -1;
bool g_writable = false;

Header *hdr() { return reinterpret_cast<Header *>(g_map); }

void save_roots() {
    Header *h = hdr();
    h->nroots = g_nroots;
    char *blob = g_map + HEADER;
    for (int i = 0; i < g_nroots; i++) {
        h->root_size[i] = g_roots[i].size;
        memcpy(blob, g_roots[i].ptr, g_roots[i].size);
        blob += g_roots[i].size;
    }
}

void restore_roots() {
    Header *h = hdr();
    char *blob = g_map + HEADER;
    int n = (int)h->nroots;
    for (int i = 0; i < n && i < g_nroots; i++) {
        assert(h->root_size[i] == g_roots[i].size);
        memcpy(g_roots[i].ptr, blob, g_roots[i].size);
        blob += h->root_size[i];
    }
}

} // namespace

extern "C" {

int perm(void *ptr, size_t size) {
    assert(g_nroots < MAX_ROOTS);
    g_roots[g_nroots].ptr = ptr;
    g_roots[g_nroots].size = size;
    g_nroots++;
    return 0;
}

int mopen(const char *fname, const char *mode, size_t size) {
    bool create = (strcmp(mode, "w+") == 0);
    bool rw = create || (strcmp(mode, "r+") == 0);
    g_fd = open(fname, rw ? (O_RDWR | (create ? O_CREAT : 0)) : O_RDONLY, 0644);
    if (g_fd < 0) {
        perror("mopen: open");
        return -1;
    }
    if (create) {
        if (size < HEADER + ROOT_AREA + (64ULL << 20))
            size = HEADER + ROOT_AREA + (64ULL << 20);
        if (ftruncate(g_fd, size) != 0) {
            perror("mopen: ftruncate");
            return -1;
        }
        g_size = size;
    } else {
        struct stat st;
        fstat(g_fd, &st);
        g_size = st.st_size;
    }
    int prot = PROT_READ | (rw ? PROT_WRITE : 0);
    /* Private mapping for read-only opens: the apps never write the heap. */
    int flags = (rw ? MAP_SHARED : MAP_PRIVATE) | MAP_FIXED_NOREPLACE;
    g_map = (char *)mmap((void *)BASE, g_size, prot, flags, g_fd, 0);
    if (g_map == MAP_FAILED || (uintptr_t)g_map != BASE) {
        perror("mopen: mmap fixed");
        return -1;
    }
    g_writable = rw;
    if (create) {
        Header *h = hdr();
        h->magic = MAGIC;
        h->size = g_size;
        h->bump = HEADER + ROOT_AREA;
        h->nroots = 0;
    } else {
        Header *h = hdr();
        if (h->magic != MAGIC) {
            fprintf(stderr, "mopen: bad heap magic in %s\n", fname);
            return -1;
        }
        restore_roots();
    }
    return 0;
}

int mflush(void) {
    if (!g_map) return -1;
    if (g_writable) {
        save_roots();
        msync(g_map, g_size, MS_SYNC);
    }
    return 0;
}

int mclose(void) {
    if (!g_map) return -1;
    mflush();
    munmap(g_map, g_size);
    close(g_fd);
    g_map = nullptr;
    return 0;
}

void *pj_malloc(size_t size) {
    if (!g_map) {
        /* before mopen: fall back to the process heap (some tools allocate
         * transient structures through the same API) */
        return malloc(size);
    }
    Header *h = hdr();
    uint64_t off = (h->bump + 15) & ~15ULL;
    if (off + size > g_size) {
        fprintf(stderr, "pj_malloc: persistent heap exhausted (%zu requested)\n", size);
        abort();
    }
    h->bump = off + size;
    return g_map + off;
}

void *pj_calloc(size_t n, size_t size) {
    void *p = pj_malloc(n * size);
    memset(p, 0, n * size);
    return p;
}

void *pj_realloc(void *p, size_t size) {
    void *q = pj_malloc(size);
    if (p) memcpy(q, p, size); /* over-copy safe: arena is contiguous */
    return q;
}

void pj_free(void *p) {
    if (!g_map || (char *)p < g_map || (char *)p >= g_map + g_size) free(p);
    /* bump allocator: persistent frees are no-ops */
}

} /* extern "C" */
