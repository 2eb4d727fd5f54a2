/* LD_PRELOAD hook: print a native backtrace when abort() fires.
 *
 * Chasing the rare full-suite SIGABRT (silent abort in eager XLA:CPU
 * dispatch under concurrent host load — see CLAUDE.md environment
 * notes). The abort is silent because it originates in a non-Python
 * thread inside libxla/tsl, so pytest's faulthandler output is the
 * Python stacks only; this prints the native frames of the aborting
 * thread to stderr before dying.
 *
 * Build:  gcc -shared -fPIC -o /tmp/abort_bt.so scripts/debug/abort_backtrace.c -ldl
 * Use:    LD_PRELOAD=/tmp/abort_bt.so python -m pytest tests/ -q
 */
#define _GNU_SOURCE
#include <dlfcn.h>
#include <execinfo.h>
#include <signal.h>
#include <stdio.h>
#include <string.h>
#include <unistd.h>

static void dump_backtrace(const char *what) {
    void *frames[64];
    int n = backtrace(frames, 64);
    char hdr[128];
    int m = snprintf(hdr, sizeof(hdr),
                     "\n=== abort_backtrace: %s in tid %ld ===\n",
                     what, (long)gettid());
    ssize_t r = write(STDERR_FILENO, hdr, (size_t)m);
    (void)r;
    backtrace_symbols_fd(frames, n, STDERR_FILENO);
    r = write(STDERR_FILENO, "=== end backtrace ===\n", 22);
    (void)r;
}

void abort(void) {
    dump_backtrace("abort()");
    void (*real_abort)(void) = dlsym(RTLD_NEXT, "abort");
    if (real_abort) real_abort();
    /* fallback: re-raise without our handler in the way */
    signal(SIGABRT, SIG_DFL);
    raise(SIGABRT);
    _exit(134);
}

/* Some abort paths go through raise(SIGABRT) directly. */
int raise(int sig) {
    if (sig == SIGABRT) dump_backtrace("raise(SIGABRT)");
    int (*real_raise)(int) = dlsym(RTLD_NEXT, "raise");
    return real_raise ? real_raise(sig) : -1;
}
