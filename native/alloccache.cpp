// Large-allocation cache, LD_PRELOADed into host-heavy processes.
//
// Why this exists (measured on the deployment VM, see SCALING.md "Host
// memory: free page reporting"): the guest kernel runs virtio free page
// reporting (boot param page_reporting_order=11), which hands freed
// pages back to the hypervisor in 8 MB chunks; re-faulting a reported
// page from the host was measured at 1-50 MB/s. glibc unconditionally
// mmap()s allocations above 32 MB and munmap()s them on free, so every
// numpy temporary or XLA:CPU buffer in the 100 MB-1 GB class is faulted
// in from the host again on EVERY allocation cycle: a 2801x669x113 mask
// pass whose arithmetic is ~7 s was measured at 46-92 s, dominated by
// page faults re-acquiring memory the process had just released.
//
// The shim intercepts malloc/calloc/realloc/free (+ the aligned
// variants) and, for requests >= SRCFINDER_ALLOC_MIN_MB (default 4),
// serves them from an in-process cache of mmap'd blocks that are NEVER
// munmap'd while the cache is under its cap — freed blocks go to a
// size-bucketed freelist, so their pages stay resident in the guest and
// are reused warm. Small allocations pass straight through to glibc
// (__libc_malloc and friends; no dlsym bootstrap needed).
//
// Interposition rules that shape the implementation:
//  - free() sees EVERY pointer in the process, so "is it ours?" must be
//    answerable without touching glibc and without allocating: a fixed
//    open-addressed registry (lock-free reads, writes under the mutex).
//  - Nothing inside the critical sections may malloc or free — a heap-
//    backed container's node deallocation would re-enter free() and
//    self-deadlock on the non-recursive mutex. Freelists are intrusive
//    (next pointers live in the 4 KB block headers); the registry is a
//    fixed global array.
//  - The singleton's own construction mallocs (getenv, operator new),
//    so an atomic init flag routes re-entrant calls to plain glibc.
//
// Block layout: [4 KB header | user data], so user pointers stay
// page-aligned (covers every alignment the stack requests; XLA:CPU
// asks for 64).
//
// Cross-process page persistence (the shm arena): the freelist only
// amortizes faults WITHIN a process — every fresh CLI still pays the
// hypervisor's first-touch tax on its whole working set (measured
// 40-57 s of the fused pipeline stage in degraded page-supply states).
// tmpfs pages, by contrast, stay resident in the guest after the
// owning process exits (they are shmem, never "free", so free page
// reporting cannot hand them back). The shim therefore carves large
// blocks from a flock-exclusive arena file under /dev/shm
// (srcfinder_arena.<slot>, bump-allocated, grown with ftruncate):
// the FIRST process on the box pays the fault tax once; every later
// process re-attaches the arena and takes minor faults at RAM speed
// (measured 3.4 GB/s vs 0.7-1.5 GB/s healthy anon, vs 9-50 MB/s
// degraded). Concurrent processes get distinct slots (kArenaSlots);
// when all slots are taken the shim falls back to anonymous mmap.
//
// fork() caveat: arena blocks are MAP_SHARED, so a forked child that
// WRITES IN PLACE into a >= 4 MB buffer LIVE across the fork would be
// visible to the parent (anonymous CoW would have isolated it). The
// atfork child handler therefore stops the CHILD from carving new
// arena blocks AND drops every arena-backed block from the child's
// inherited freelist (both sides would otherwise pop the same block
// and write the same /dev/shm offsets); the framework's own fork
// users (flow/msf_flow.py workers) pass file paths, not live arrays.
// Disable outright with SRCFINDER_ALLOC_SHM=0 for foreign workloads
// that fork-and-mutate live buffers.
//
// Tunables (env):
//   SRCFINDER_ALLOC_CACHE=0       disable (pure pass-through)
//   SRCFINDER_ALLOC_MIN_MB=N      interception threshold (default 4)
//   SRCFINDER_ALLOC_CACHE_GB=N    max bytes parked in the freelist
//                                 (default 48; beyond it blocks are
//                                 munmap'd on free)
//   SRCFINDER_ALLOC_SHM=0        disable the /dev/shm arena (blocks
//                                 come from anonymous mmap as before)
//   SRCFINDER_ALLOC_SHM_GB=N     arena file cap (default 12; carves
//                                 past it fall back to anonymous mmap)
//   SRCFINDER_ALLOC_SHM_DIR=D    arena directory (default /dev/shm;
//                                 must be tmpfs for the persistence
//                                 win — any dir works correctness-wise)
//
// This is a host-runtime component of the framework, not a TPU-path
// optimization: HBM buffers are unaffected. It exists because the
// framework's streaming stages (core/prefetch.py, masks/sds.py,
// cmf/pipeline.py) intentionally recycle GB-scale host blocks, which is
// exactly the allocation pattern free page reporting punishes.

#include <dlfcn.h>
#include <sys/mman.h>
#include <sys/file.h>
#include <sys/stat.h>
#include <sys/statvfs.h>
#include <fcntl.h>
#include <unistd.h>
#include <pthread.h>
#include <string.h>
#include <stdlib.h>
#include <stdint.h>
#include <stdio.h>
#include <errno.h>

#include <atomic>

extern "C" {
void *__libc_malloc(size_t);
void *__libc_calloc(size_t, size_t);
void *__libc_realloc(void *, size_t);
void  __libc_free(void *);
void *__libc_memalign(size_t, size_t);
}

namespace {

constexpr size_t kGranule = 2u << 20;     // round block payloads to 2 MB
constexpr size_t kHeader = 4096;          // keeps user data page-aligned
constexpr uint64_t kMagic = 0x73726366616c6cULL;  // "srcfall"
constexpr int kTableBits = 16;            // 65536 registry slots
constexpr size_t kTableSize = size_t(1) << kTableBits;
constexpr uintptr_t kTomb = 1;            // deleted-slot sentinel
constexpr int kBuckets = 16;              // freelist: log2(granules)

struct BlockHeader {
    uint64_t magic;
    size_t map_size;       // total mmap length incl. header
    BlockHeader *next;     // freelist link
    bool from_arena;       // MAP_SHARED carve from the shm arena file
                           // (atfork_child must drop these from the
                           // freelist: parent and child would otherwise
                           // pop the same block from their copies of
                           // the buckets and write the same /dev/shm
                           // offsets)
};

// Registry of live user pointers: open addressing, linear probing.
// Reads are lock-free (free() probes it for every pointer in the
// process); inserts/removes happen under the mutex.
//
// Tombstones accumulate (remove never writes 0 — that would break
// other keys' probe chains), so a long-running process could exhaust
// the never-used slots that terminate probes. Three guards:
//  - every probe loop is bounded by kTableSize (a full sweep answers
//    definitively; no infinite spin even with zero free slots),
//  - inserts track the zero-slot budget and REBUILD the table (clear
//    tombstones, under the mutex) when it runs low,
//  - a seqlock epoch makes the rebuild safe against the lock-free
//    readers: contains() retries if the epoch moved underneath it, so
//    it can never misreport a live cache pointer as foreign (which
//    would route it to __libc_free and corrupt the glibc heap).
std::atomic<uintptr_t> g_table[kTableSize];
std::atomic<uint64_t> g_epoch{0};       // odd while a rebuild runs
size_t g_zeros = kTableSize;            // never-used slots (under mutex)
uintptr_t g_rebuild_buf[kTableSize];    // scratch (under mutex)

void registry_rebuild();

constexpr int kArenaSlots = 4;

struct State {
    pthread_mutex_t lock = PTHREAD_MUTEX_INITIALIZER;
    BlockHeader *buckets[kBuckets] = {};   // by log2 of granule count
    size_t cached = 0;                     // bytes parked in freelists
    size_t min_bytes = 4u << 20;
    size_t cap_bytes = 48ull << 30;
    bool enabled = true;
    // /dev/shm arena (cross-process page persistence; header comment)
    int arena_fd = -1;                     // -1: anonymous mmap only
    size_t arena_bump = 0;                 // next carve offset (mutex)
    size_t arena_file = 0;                 // current file size (mutex)
    size_t arena_cap = 12ull << 30;
};

std::atomic<State *> g_state{nullptr};
std::atomic<bool> g_initing{false};

void atfork_lock();
void atfork_unlock();
void atfork_child();

// Lazily construct the singleton. Construction itself mallocs, and
// those re-entrant calls MUST NOT recurse into the initializer — the
// g_initing flag makes them (and any concurrent first caller) fall back
// to glibc pass-through, which is always safe: nothing can be
// cache-owned before the state exists. Leaked deliberately: frees
// arrive during teardown after static destructors have run.
State *state() {
    State *s = g_state.load(std::memory_order_acquire);
    if (s != nullptr) return s;
    if (g_initing.exchange(true)) return nullptr;
    State *st = new State();
    if (const char *v = getenv("SRCFINDER_ALLOC_CACHE"))
        st->enabled = !(v[0] == '0' && v[1] == '\0');
    if (const char *v = getenv("SRCFINDER_ALLOC_MIN_MB")) {
        long mb = atol(v);
        if (mb > 0) st->min_bytes = (size_t)mb << 20;
    }
    if (const char *v = getenv("SRCFINDER_ALLOC_CACHE_GB")) {
        long gb = atol(v);
        if (gb >= 0) st->cap_bytes = (size_t)gb << 30;
    }
    bool shm = st->enabled;
    if (const char *v = getenv("SRCFINDER_ALLOC_SHM"))
        shm = !(v[0] == '0' && v[1] == '\0');
    if (const char *v = getenv("SRCFINDER_ALLOC_SHM_GB")) {
        long gb = atol(v);
        if (gb >= 0) st->arena_cap = (size_t)gb << 30;
    }
    if (shm && st->arena_cap > 0) {
        const char *dir = getenv("SRCFINDER_ALLOC_SHM_DIR");
        if (dir == nullptr || dir[0] == '\0') dir = "/dev/shm";
        for (int i = 0; i < kArenaSlots; ++i) {
            char path[512];
            snprintf(path, sizeof path, "%s/srcfinder_arena.%d", dir, i);
            // The arena dir (/dev/shm) is world-writable: an attacker
            // who pre-creates the slot (a 0666 file, or a symlink to a
            // victim file) would get read/write access to every large
            // buffer this process allocates. O_NOFOLLOW refuses
            // symlinks; the fstat gate refuses anything that is not a
            // plain single-link 0600 file we own. The 0600 mode only
            // applies on create, so it must be VERIFIED, not assumed.
            int fd = open(path, O_RDWR | O_CREAT | O_CLOEXEC | O_NOFOLLOW,
                          0600);
            if (fd < 0) continue;          // symlink/perms: try next slot
            struct stat sb;
            if (fstat(fd, &sb) != 0 || !S_ISREG(sb.st_mode) ||
                sb.st_uid != geteuid() || sb.st_nlink != 1 ||
                (sb.st_mode & 0077) != 0) {
                close(fd);                 // foreign/tampered: never use
                continue;
            }
            if (flock(fd, LOCK_EX | LOCK_NB) == 0) {
                st->arena_fd = fd;         // exclusive while we live
                st->arena_file = (size_t)sb.st_size;
                // cap the arena at what the filesystem can actually
                // back (tmpfs is finite): existing file + free space
                struct statvfs vfs;
                if (fstatvfs(fd, &vfs) == 0) {
                    size_t room = st->arena_file +
                        (size_t)vfs.f_bavail * (size_t)vfs.f_frsize;
                    if (room < st->arena_cap) st->arena_cap = room;
                }
                break;
            }
            close(fd);                     // another process owns it
        }
    }
    g_state.store(st, std::memory_order_release);
    // see atfork_lock below; safe here — only the one thread that won
    // g_initing reaches this, and the handlers no-op until g_state is set
    pthread_atfork(atfork_lock, atfork_unlock, atfork_child);
    return st;
}

inline size_t slot_of(uintptr_t p) {
    return (size_t)(((p >> 12) * 0x9E3779B97F4A7C15ULL) >>
                    (64 - kTableBits));
}

// Lock-free membership probe (callers re-verify under the mutex before
// mutating). Linear probing, stop at the first never-used slot; bounded
// by a full sweep; seqlock-retried across rebuilds.
bool registry_contains(uintptr_t p) {
    for (;;) {
        uint64_t e1 = g_epoch.load(std::memory_order_acquire);
        if (e1 & 1) continue;                 // rebuild in flight
        bool found = false, decided = false;
        size_t start = slot_of(p);
        for (size_t n = 0; n < kTableSize; ++n) {
            size_t i = (start + n) & (kTableSize - 1);
            uintptr_t v = g_table[i].load(std::memory_order_acquire);
            if (v == p) { found = true; decided = true; break; }
            if (v == 0) { decided = true; break; }
        }
        if (!decided) found = false;          // full sweep: not present
        if (g_epoch.load(std::memory_order_acquire) == e1) return found;
    }
}

// Under the mutex (so no rebuild can run concurrently). Returns false
// if the table is full (caller then must not serve from the cache).
bool registry_insert(uintptr_t p) {
    // keep >= 1/8 of the table never-used so probes stay short and
    // always terminate early; rebuilding clears accumulated tombstones
    if (g_zeros < kTableSize / 8) registry_rebuild();
    size_t start = slot_of(p);
    for (size_t n = 0; n < kTableSize; ++n) {
        size_t i = (start + n) & (kTableSize - 1);
        uintptr_t v = g_table[i].load(std::memory_order_relaxed);
        if (v == 0 || v == kTomb) {
            if (v == 0) --g_zeros;
            g_table[i].store(p, std::memory_order_release);
            return true;
        }
    }
    return false;
}

// Under the mutex. Returns false if p was not present.
bool registry_remove(uintptr_t p) {
    size_t start = slot_of(p);
    for (size_t n = 0; n < kTableSize; ++n) {
        size_t i = (start + n) & (kTableSize - 1);
        uintptr_t v = g_table[i].load(std::memory_order_relaxed);
        if (v == p) {
            g_table[i].store(kTomb, std::memory_order_release);
            return true;
        }
        if (v == 0) return false;
    }
    return false;
}

// Under the mutex. Collect live keys, zero the table, reinsert —
// tombstones vanish. The epoch is odd for the duration so lock-free
// readers retry instead of trusting a half-built table.
void registry_rebuild() {
    g_epoch.fetch_add(1, std::memory_order_acq_rel);      // -> odd
    size_t n = 0;
    for (size_t i = 0; i < kTableSize; ++i) {
        uintptr_t v = g_table[i].load(std::memory_order_relaxed);
        if (v != 0 && v != kTomb) g_rebuild_buf[n++] = v;
        g_table[i].store(0, std::memory_order_relaxed);
    }
    g_zeros = kTableSize;
    for (size_t k = 0; k < n; ++k) {
        uintptr_t p = g_rebuild_buf[k];
        for (size_t s = slot_of(p);; s = (s + 1) & (kTableSize - 1)) {
            if (g_table[s].load(std::memory_order_relaxed) == 0) {
                g_table[s].store(p, std::memory_order_relaxed);
                --g_zeros;
                break;
            }
        }
    }
    g_epoch.fetch_add(1, std::memory_order_acq_rel);      // -> even
}

class Guard {
  public:
    explicit Guard(State *s) : s_(s) { pthread_mutex_lock(&s_->lock); }
    ~Guard() { pthread_mutex_unlock(&s_->lock); }

  private:
    State *s_;
};

inline int bucket_of(size_t map_size) {
    size_t g = map_size / kGranule;       // >= 1
    int b = 63 - __builtin_clzll(g);      // log2 floor
    return b < kBuckets ? b : kBuckets - 1;
}

inline BlockHeader *header_of(void *user) {
    return reinterpret_cast<BlockHeader *>((char *)user - kHeader);
}

void *cache_alloc(size_t size) {
    State *s = state();
    if (s == nullptr) return nullptr;
    size_t want = (size + kHeader + kGranule - 1) & ~(kGranule - 1);
    {
        Guard g(s);
        // first fit within the exact bucket and the next one up, but
        // never a block more than 2x the request — handing a 1 GB
        // block to a 4 MB ask would strand the rest
        for (int b = bucket_of(want); b <= bucket_of(want) + 1 &&
                                      b < kBuckets; ++b) {
            for (BlockHeader **prev = &s->buckets[b]; *prev;
                 prev = &(*prev)->next) {
                BlockHeader *blk = *prev;
                if (blk->map_size >= want && blk->map_size <= 2 * want) {
                    *prev = blk->next;
                    blk->next = nullptr;
                    s->cached -= blk->map_size;
                    void *user = (char *)blk + kHeader;
                    if (!registry_insert((uintptr_t)user)) {
                        // table full: this block can never be freed
                        // through the cache — unmap and fall through
                        munmap(blk, blk->map_size);
                        return nullptr;
                    }
                    return user;
                }
            }
        }
    }
    void *m = MAP_FAILED;
    bool from_arena = false;
    if (s->arena_fd >= 0) {
        // Carve from the shm arena: reserve [bump, bump+want) under the
        // mutex (RESERVING the tmpfs pages first — ftruncate alone
        // allocates nothing, so a full /dev/shm would deliver SIGBUS on
        // the first write into a carved page; fallocate surfaces ENOSPC
        // here instead, and the carve falls through to anonymous
        // memory), map outside it. The arena is an optimization, never
        // a requirement.
        size_t off = SIZE_MAX;
        {
            Guard g(s);
            if (s->arena_fd >= 0 && s->arena_bump + want <= s->arena_cap) {
                if (s->arena_bump + want > s->arena_file) {
                    size_t to = s->arena_bump + want;
                    int r = fallocate(s->arena_fd, 0,
                                      (off_t)s->arena_file,
                                      (off_t)(to - s->arena_file));
                    if (r != 0 && (errno == EOPNOTSUPP ||
                                   errno == ENOSYS))
                        // non-tmpfs arena dir without fallocate: keep
                        // the original best-effort growth
                        r = ftruncate(s->arena_fd, (off_t)to);
                    if (r == 0)
                        s->arena_file = to;
                    else if (errno == ENOSPC)
                        s->arena_cap = s->arena_file;  // stop retrying
                }
                if (s->arena_bump + want <= s->arena_file) {
                    off = s->arena_bump;
                    s->arena_bump += want;
                }
            }
        }
        if (off != SIZE_MAX) {
            m = mmap(nullptr, want, PROT_READ | PROT_WRITE, MAP_SHARED,
                     s->arena_fd, (off_t)off);
            from_arena = (m != MAP_FAILED);
        }
    }
    if (m == MAP_FAILED)
        m = mmap(nullptr, want, PROT_READ | PROT_WRITE,
                 MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
    if (m == MAP_FAILED) return nullptr;
    BlockHeader *blk = reinterpret_cast<BlockHeader *>(m);
    blk->magic = kMagic;
    blk->map_size = want;
    blk->next = nullptr;
    blk->from_arena = from_arena;
    void *user = (char *)m + kHeader;
    Guard g(s);
    if (!registry_insert((uintptr_t)user)) {
        munmap(m, want);
        return nullptr;
    }
    return user;
}

// Returns true if ptr belonged to the cache. No allocation inside.
bool cache_free(void *ptr) {
    if (!registry_contains((uintptr_t)ptr)) return false;
    State *s = g_state.load(std::memory_order_acquire);
    if (s == nullptr) return false;
    Guard g(s);
    if (!registry_remove((uintptr_t)ptr)) return false;  // lost a race
    BlockHeader *blk = header_of(ptr);
    if (s->cached + blk->map_size <= s->cap_bytes) {
        int b = bucket_of(blk->map_size);
        blk->next = s->buckets[b];
        s->buckets[b] = blk;
        s->cached += blk->map_size;
    } else {
        munmap(blk, blk->map_size);
    }
    return true;
}

// Usable payload size if ptr is cache-owned, else 0.
size_t cache_size(void *ptr) {
    if (!registry_contains((uintptr_t)ptr)) return 0;
    State *s = g_state.load(std::memory_order_acquire);
    if (s == nullptr) return 0;
    Guard g(s);
    if (!registry_contains((uintptr_t)ptr)) return 0;
    BlockHeader *blk = header_of(ptr);
    if (blk->magic != kMagic) return 0;
    return blk->map_size - kHeader;
}

// fork() while another thread holds the allocator mutex would leave the
// child's copy locked forever (Python multiprocessing defaults to fork
// on Linux, and the framework mixes it with prefetch threads). Classic
// atfork protocol: take the lock across fork, release it on both sides.
// Registered lazily from state() — before the state exists nothing can
// hold the lock.
void atfork_lock() {
    if (State *s = g_state.load(std::memory_order_acquire))
        pthread_mutex_lock(&s->lock);
}
void atfork_unlock() {
    if (State *s = g_state.load(std::memory_order_acquire))
        pthread_mutex_unlock(&s->lock);
}
// The child must not carve from the arena: parent and child would bump
// the same offsets independently and hand out overlapping MAP_SHARED
// ranges. LIVE blocks carved before the fork stay mapped (see the
// fork() caveat in the header comment), but arena-backed blocks in the
// inherited FREELIST must go: parent and child each hold a copy of the
// buckets, so both could pop the same block and write the same
// /dev/shm offsets — the child munmaps them so it can never serve a
// MAP_SHARED block it shares with the parent (anonymous blocks keep
// CoW semantics and stay). Safe here: the lock was held across fork,
// so the lists are consistent, and munmap is async-signal-safe. The fd
// is left open on purpose — closing it would not release the parent's
// flock (same open file description) and close() is not
// async-signal-safe enough for atfork.
void atfork_child() {
    if (State *s = g_state.load(std::memory_order_acquire)) {
        pthread_mutex_unlock(&s->lock);
        s->arena_fd = -1;
        for (int b = 0; b < kBuckets; ++b) {
            BlockHeader **prev = &s->buckets[b];
            while (BlockHeader *blk = *prev) {
                if (blk->from_arena) {
                    *prev = blk->next;
                    s->cached -= blk->map_size;
                    munmap(blk, blk->map_size);
                } else {
                    prev = &blk->next;
                }
            }
        }
    }
}

bool use_cache(size_t size) {
    State *s = g_state.load(std::memory_order_acquire);
    if (s == nullptr) {
        if (size < (4u << 20)) return false;  // below any threshold
        s = state();
        if (s == nullptr) return false;       // init in progress
    }
    return s->enabled && size >= s->min_bytes;
}

}  // namespace

extern "C" {

void *malloc(size_t size) {
    if (use_cache(size)) {
        if (void *p = cache_alloc(size)) return p;
    }
    return __libc_malloc(size);
}

void *calloc(size_t n, size_t elem) {
    size_t size;
    if (__builtin_mul_overflow(n, elem, &size)) {
        errno = ENOMEM;
        return nullptr;
    }
    if (use_cache(size)) {
        if (void *p = cache_alloc(size)) {
            memset(p, 0, size);  // reused blocks carry stale contents
            return p;
        }
    }
    return __libc_calloc(n, elem);
}

void free(void *ptr) {
    if (ptr == nullptr) return;
    if (!cache_free(ptr)) __libc_free(ptr);
}

void *realloc(void *ptr, size_t size) {
    if (ptr == nullptr) return malloc(size);
    if (size == 0) {
        free(ptr);
        return nullptr;
    }
    size_t have = cache_size(ptr);
    if (have) {
        if (size <= have) return ptr;     // still fits the block
        void *p = malloc(size);
        if (p == nullptr) return nullptr;
        memcpy(p, ptr, have);
        cache_free(ptr);
        return p;
    }
    // Not ours: glibc must size the copy, so it must do the realloc.
    // (A grown result >= threshold stays outside the cache until its
    // next alloc/free cycle — acceptable; realloc of GB blocks is rare
    // in this stack.)
    return __libc_realloc(ptr, size);
}

// glibc's malloc_usable_size reads its own chunk header below the user
// pointer; for cache-owned blocks that memory is our BlockHeader, so it
// must be answered here (callers like jemalloc-backed stacks and
// OpenBLAS probe it on arbitrary pointers). Resolved lazily via dlsym
// (RTLD_NEXT = the next malloc_usable_size after this preload, i.e.
// glibc's); dlsym may malloc on first use, which is re-entrancy-safe
// here (we hold no lock and our malloc passes small asks to glibc).
size_t malloc_usable_size(void *ptr) {
    if (ptr == nullptr) return 0;
    if (size_t have = cache_size(ptr)) return have;
    static std::atomic<void *> next{nullptr};
    void *fn = next.load(std::memory_order_acquire);
    if (fn == nullptr) {
        fn = dlsym(RTLD_NEXT, "malloc_usable_size");
        if (fn == nullptr) return 0;
        next.store(fn, std::memory_order_release);
    }
    return reinterpret_cast<size_t (*)(void *)>(fn)(ptr);
}

void *memalign(size_t align, size_t size) {
    // cache blocks are page-aligned
    if (use_cache(size) && align <= 4096 &&
        (align & (align - 1)) == 0) {
        if (void *p = cache_alloc(size)) return p;
    }
    return __libc_memalign(align, size);
}

void *aligned_alloc(size_t align, size_t size) {
    return memalign(align, size);
}

int posix_memalign(void **out, size_t align, size_t size) {
    if (align < sizeof(void *) || (align & (align - 1)) != 0)
        return EINVAL;
    void *p = memalign(align, size);
    if (p == nullptr) return ENOMEM;
    *out = p;
    return 0;
}

}  // extern "C"
