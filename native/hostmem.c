/* tpufem host memory allocator: a NumPy PyDataMem_Handler that mmaps
 * large blocks and batch-populates them with MADV_POPULATE_WRITE.
 *
 * Why this exists: on lazily-backed virtual machines (snapshot-restored
 * microVMs — the TPU build hosts this framework targets), the first
 * write to a never-touched page takes a VM-exit round trip measured at
 * ~440 us/4K page (~9 MB/s). NumPy's default allocator (glibc malloc)
 * mmaps every block past the mmap threshold and munmaps it on free, so
 * large temporaries pay that first-touch cost over and over: a profiled
 * 6.2M-DoF lane-plan build spent 90 s of its 268 s inside np.full alone.
 * MADV_POPULATE_WRITE populates the same pages kernel-side at the
 * measured 1.7-2.9 GB/s (~250x), and a size-classed free-list arena
 * reuses populated blocks so repeated temporaries fault nothing at all.
 *
 * Role parity: the reference links a pooling host allocator through
 * PETSc/hypre (their Mat/Vec memory all rides PetscMalloc pools); this
 * is the tpu-native equivalent for the host preprocessing layer, wired
 * into NumPy via the documented PyDataMem_SetHandler C API.
 *
 * Small allocations (< BIG_THRESHOLD) delegate to libc malloc. Every
 * block carries a 64-byte header (magic + total size + arena class) so
 * free/realloc dispatch without consulting NumPy's size bookkeeping.
 *
 * Build: see tpufem/hostmem.py (cc -O3 -shared -fPIC, Python + NumPy
 * include dirs). Module name: tpufem_hostmem.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_22_API_VERSION
#define NPY_TARGET_VERSION NPY_1_22_API_VERSION
#include <numpy/arrayobject.h>

#include <errno.h>
#include <pthread.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <sys/mman.h>

#ifndef MADV_POPULATE_WRITE
#define MADV_POPULATE_WRITE 23
#endif

#define HDR_SIZE 64
#define MAGIC_MMAP 0x7470666d6d617031ULL /* "tpfmmap1" */
#define MAGIC_LIBC 0x7470666c69626331ULL /* "tpflibc1" */

/* blocks >= this go to the mmap arena (2 MB: one THP / small multiple
 * of the populate syscall's fixed cost) */
static size_t big_threshold = 2u << 20;
/* arena rounds block sizes up to multiples of this */
#define CLASS_UNIT (2u << 20)
/* largest cached class: bigger blocks are munmapped on free */
#define MAX_CLASSES 8192 /* 8192 * 2 MB = 16 GB */
/* default cap on total cached (freed but retained) bytes */
static size_t cache_cap = (size_t)24 << 30;

typedef struct block_hdr {
    uint64_t magic;
    uint64_t total; /* bytes including header */
    struct block_hdr *next; /* free-list link while cached */
    uint64_t pad[5];
} block_hdr;

static block_hdr *free_lists[MAX_CLASSES];
static size_t cached_bytes = 0;
static pthread_mutex_t arena_lock = PTHREAD_MUTEX_INITIALIZER;
static int populate_ok = 1; /* flips off if the kernel lacks the madvise */

/* stats (approximate, read without the lock) */
static uint64_t n_mmap = 0, n_reuse = 0, n_libc = 0;
static uint64_t populated_bytes = 0;

static void *arena_alloc(size_t total, int zero) {
    size_t cls = (total + CLASS_UNIT - 1) / CLASS_UNIT;
    size_t rounded = cls * CLASS_UNIT;
    block_hdr *blk = NULL;
    if (cls < MAX_CLASSES) {
        pthread_mutex_lock(&arena_lock);
        blk = free_lists[cls];
        if (blk) {
            free_lists[cls] = blk->next;
            cached_bytes -= rounded;
            n_reuse++;
        }
        pthread_mutex_unlock(&arena_lock);
    }
    if (blk) {
        if (zero)
            memset((char *)blk + HDR_SIZE, 0, total - HDR_SIZE);
        blk->magic = MAGIC_MMAP;
        blk->total = rounded;
        blk->next = NULL;
        return (char *)blk + HDR_SIZE;
    }
    void *p = mmap(NULL, rounded, PROT_READ | PROT_WRITE,
                   MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
    if (p == MAP_FAILED)
        return NULL;
    if (populate_ok &&
        madvise(p, rounded, MADV_POPULATE_WRITE) != 0) {
        if (errno == EINVAL || errno == ENOSYS)
            populate_ok = 0; /* old kernel: plain faulting still works */
    } else if (populate_ok) {
        __atomic_add_fetch(&populated_bytes, rounded, __ATOMIC_RELAXED);
    }
    __atomic_add_fetch(&n_mmap, 1, __ATOMIC_RELAXED);
    block_hdr *h = (block_hdr *)p;
    h->magic = MAGIC_MMAP;
    h->total = rounded;
    h->next = NULL;
    /* fresh anonymous mmap is already zero — `zero` needs no memset */
    return (char *)p + HDR_SIZE;
}

static void arena_release(block_hdr *h) {
    size_t rounded = h->total;
    size_t cls = rounded / CLASS_UNIT;
    if (cls < MAX_CLASSES) {
        pthread_mutex_lock(&arena_lock);
        if (cached_bytes + rounded <= cache_cap) {
            h->next = free_lists[cls];
            free_lists[cls] = h;
            cached_bytes += rounded;
            pthread_mutex_unlock(&arena_lock);
            return;
        }
        pthread_mutex_unlock(&arena_lock);
    }
    munmap(h, rounded);
}

static void *hm_malloc_impl(size_t size, int zero) {
    size_t total = size + HDR_SIZE;
    if (total >= big_threshold)
        return arena_alloc(total, zero);
    block_hdr *h = zero ? (block_hdr *)calloc(1, total)
                        : (block_hdr *)malloc(total);
    if (!h)
        return NULL;
    h->magic = MAGIC_LIBC;
    h->total = total;
    __atomic_add_fetch(&n_libc, 1, __ATOMIC_RELAXED);
    return (char *)h + HDR_SIZE;
}

static void hm_free_impl(void *ptr) {
    if (!ptr)
        return;
    block_hdr *h = (block_hdr *)((char *)ptr - HDR_SIZE);
    if (h->magic == MAGIC_MMAP)
        arena_release(h);
    else
        free(h); /* MAGIC_LIBC */
}

/* ---- PyDataMemAllocator hooks ------------------------------------- */

static void *hm_malloc(void *ctx, size_t size) {
    (void)ctx;
    return hm_malloc_impl(size ? size : 1, 0);
}

static void *hm_calloc(void *ctx, size_t nelem, size_t elsize) {
    (void)ctx;
    if (nelem && elsize > (SIZE_MAX - HDR_SIZE) / nelem)
        return NULL;
    size_t size = nelem * elsize;
    return hm_malloc_impl(size ? size : 1, 1);
}

static void *hm_realloc(void *ctx, void *ptr, size_t new_size) {
    (void)ctx;
    if (!ptr)
        return hm_malloc_impl(new_size ? new_size : 1, 0);
    block_hdr *h = (block_hdr *)((char *)ptr - HDR_SIZE);
    size_t old_avail = h->total - HDR_SIZE;
    if (h->magic == MAGIC_LIBC && new_size + HDR_SIZE < big_threshold) {
        block_hdr *nh = (block_hdr *)realloc(h, new_size + HDR_SIZE);
        if (!nh)
            return NULL;
        nh->total = new_size + HDR_SIZE;
        return (char *)nh + HDR_SIZE;
    }
    if (h->magic == MAGIC_MMAP && new_size + HDR_SIZE <= h->total)
        return ptr; /* shrink within the rounded class: keep */
    void *np_ = hm_malloc_impl(new_size, 0);
    if (!np_)
        return NULL;
    memcpy(np_, ptr, old_avail < new_size ? old_avail : new_size);
    hm_free_impl(ptr);
    return np_;
}

static void hm_free(void *ctx, void *ptr, size_t size) {
    (void)ctx;
    (void)size;
    hm_free_impl(ptr);
}

static PyDataMem_Handler hm_handler = {
    "tpufem_hostmem",
    1,
    {
        NULL, /* ctx */
        hm_malloc,
        hm_calloc,
        hm_realloc,
        hm_free,
    },
};

/* ---- module ------------------------------------------------------- */

static PyObject *prev_handler = NULL;

static PyObject *hm_install(PyObject *self, PyObject *args) {
    (void)self;
    (void)args;
    PyObject *cap =
        PyCapsule_New(&hm_handler, "mem_handler", NULL);
    if (!cap)
        return NULL;
    PyObject *old = PyDataMem_SetHandler(cap);
    Py_DECREF(cap);
    if (!old)
        return NULL;
    Py_XDECREF(prev_handler);
    prev_handler = old; /* keep: restored by uninstall() */
    Py_RETURN_NONE;
}

static PyObject *hm_uninstall(PyObject *self, PyObject *args) {
    (void)self;
    (void)args;
    if (prev_handler) {
        PyObject *old = PyDataMem_SetHandler(prev_handler);
        Py_XDECREF(old);
        Py_CLEAR(prev_handler);
    }
    Py_RETURN_NONE;
}

static PyObject *hm_stats(PyObject *self, PyObject *args) {
    (void)self;
    (void)args;
    return Py_BuildValue(
        "{s:K,s:K,s:K,s:K,s:K,s:i}", "n_mmap", (unsigned long long)n_mmap,
        "n_reuse", (unsigned long long)n_reuse, "n_libc",
        (unsigned long long)n_libc, "cached_bytes",
        (unsigned long long)cached_bytes, "populated_bytes",
        (unsigned long long)populated_bytes, "populate_ok", populate_ok);
}

static PyObject *hm_trim(PyObject *self, PyObject *args) {
    (void)self;
    (void)args;
    pthread_mutex_lock(&arena_lock);
    for (int c = 0; c < MAX_CLASSES; ++c) {
        block_hdr *h = free_lists[c];
        free_lists[c] = NULL;
        while (h) {
            block_hdr *nx = h->next;
            munmap(h, h->total);
            h = nx;
        }
    }
    cached_bytes = 0;
    pthread_mutex_unlock(&arena_lock);
    Py_RETURN_NONE;
}

static PyObject *hm_set_cache_cap(PyObject *self, PyObject *args) {
    (void)self;
    unsigned long long cap;
    if (!PyArg_ParseTuple(args, "K", &cap))
        return NULL;
    cache_cap = (size_t)cap;
    Py_RETURN_NONE;
}

static PyMethodDef hm_methods[] = {
    {"install", hm_install, METH_NOARGS,
     "Install the arena allocator as NumPy's data memory handler."},
    {"uninstall", hm_uninstall, METH_NOARGS,
     "Restore the previously active handler."},
    {"stats", hm_stats, METH_NOARGS, "Allocator counters."},
    {"trim", hm_trim, METH_NOARGS, "Release all cached blocks."},
    {"set_cache_cap", hm_set_cache_cap, METH_VARARGS,
     "Set the free-list retention cap in bytes."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef hm_module = {
    PyModuleDef_HEAD_INIT, "tpufem_hostmem",
    "mmap+MADV_POPULATE_WRITE arena allocator for NumPy",
    -1, hm_methods, NULL, NULL, NULL, NULL,
};

PyMODINIT_FUNC PyInit_tpufem_hostmem(void) {
    import_array();
    return PyModule_Create(&hm_module);
}
