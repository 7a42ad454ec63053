#define _GNU_SOURCE
#include <dlfcn.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/mman.h>
#include <unistd.h>
#include <execinfo.h>

static char boot[1<<20]; static size_t bootoff=0;
#define PAGE 4096
#define NSLOTS (1<<22)
static void* live[NSLOTS];
static size_t lbase[NSLOTS];
static size_t lpages[NSLOTS];
static unsigned h(void* p){ return (((unsigned long)p >> 4) * 2654435761u >> 8) & (NSLOTS-1); }

void* malloc(size_t n){
    if (n==0) n=1;
    size_t need = (n + 15) & ~15UL;
    size_t pages = need/PAGE + 2;
    char* base = mmap(0, pages*PAGE, PROT_READ|PROT_WRITE, MAP_PRIVATE|MAP_ANONYMOUS, -1, 0);
    if (base==MAP_FAILED) return 0;
    mprotect(base + (pages-1)*PAGE, PAGE, PROT_NONE);
    char* p = base + (pages-1)*PAGE - need;
    ((size_t*)base)[3] = n;
    unsigned i=h(p);
    for (unsigned k=0;k<256;k++){ unsigned j=(i+k)&(NSLOTS-1); if(!live[j]){ live[j]=p; lbase[j]=(size_t)base; lpages[j]=pages; break; } }
    return p;
}
void free(void* p){
    if (!p) return;
    if ((char*)p>=boot && (char*)p<boot+sizeof boot) return;
    unsigned i=h(p);
    for (unsigned k=0;k<256;k++){
        unsigned j=(i+k)&(NSLOTS-1);
        if (live[j]==p){
            mprotect((void*)lbase[j], lpages[j]*PAGE, PROT_NONE);
            live[j]=0;
            return;
        }
    }
    fprintf(stderr,"[efence] BAD FREE %p\n", p);
    void* bt[24]; int n=backtrace(bt,24); backtrace_symbols_fd(bt,n,2);
}
static size_t chunk_size(void* p){
    unsigned i=h(p);
    for (unsigned k=0;k<256;k++){ unsigned j=(i+k)&(NSLOTS-1); if(live[j]==p) return ((size_t*)lbase[j])[3]; }
    return 0;
}
void* calloc(size_t a,size_t b){
    size_t n=a*b; if(!n) n=1;
    if (bootoff+n<sizeof boot && n<4096){ void* p=boot+bootoff; bootoff+=(n+15)&~15UL; memset(p,0,n); return p; }
    void* p=malloc(n); if (p) memset(p,0,n); return p;
}
void* realloc(void* p,size_t n){
    void* q=malloc(n);
    if (p&&q){ size_t old=chunk_size(p); if(!old) old=n; memcpy(q,p,old<n?old:n); free(p);}
    return q;
}
