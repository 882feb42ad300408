/* C port of the HtmlLexer hot path (functions/lexer.py is the canonical
 * spec; this file mirrors it rule-for-rule).  Compiled lazily by
 * clexer.py into a /tmp cache and loaded via ctypes; any build/load
 * failure falls back to the pure-Python kernel, so this file is a pure
 * accelerator — never a semantics owner.  Scanner semantics (flex
 * longest-match, first-rule-on-tie, per start condition) are implemented
 * with the same ordered-rule structure as the Python generic dispatch so
 * the two can be reviewed side by side; the differential fuzz tests in
 * tests/test_clexer.py pin byte parity.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <sys/types.h>

typedef uint8_t u8;

/* ---- callbacks into Python (rare paths) ---- */
/* mode 0: <a>/<frame> link_add   — ret len>=0 resolved, -1 bad URL
 * mode 1: <link> feed href       — ret len>=0 resolved, -1 keep original+warn
 * If ret > cap the caller enlarges its buffer and calls again. */
typedef ssize_t (*resolve_cb_t)(const u8 *link, ssize_t len, int mode,
                                u8 *out, ssize_t cap);
/* numeric char ref with cp >= CLEX_BMP_LIMIT: UTF-8 bytes (cap 8), 0 = undefined */
typedef ssize_t (*numref_cb_t)(uint32_t cp, u8 *out);

/* ---- growable byte buffer ---- */
typedef struct {
    u8 *p;
    size_t len, cap;
} Buf;

static int buf_reserve(Buf *b, size_t extra) {
    if (b->len + extra <= b->cap) return 0;
    size_t cap = b->cap ? b->cap : 256;
    while (cap < b->len + extra) cap *= 2;
    u8 *np = (u8 *)realloc(b->p, cap);
    if (!np) return -1;
    b->p = np;
    b->cap = cap;
    return 0;
}
static int buf_add(Buf *b, const u8 *src, size_t n) {
    if (buf_reserve(b, n)) return -1;
    memcpy(b->p + b->len, src, n);
    b->len += n;
    return 0;
}
static int buf_add1(Buf *b, u8 c) { return buf_add(b, &c, 1); }

/* ---- token batch ---- */
enum { T_DATA = 1, T_START = 2, T_END = 3, T_TAGC = 4, T_ATTRNAME = 5,
       T_NAME = 6, T_NUMBER = 7, T_NMTOKEN = 8, T_LITERAL = 9,
       T_PI = 13, T_MARKUP_DECL = 14 };

typedef struct {
    int type;
    size_t off, len;   /* into Lex.tokarena */
} Tok;

/* ---- entity tables (set once at init) ---- */
static const u8 *g_ent_blob = NULL;   /* packed: u16 nlen,u16 elen,name,exp ... */
static const u8 **g_ent_name = NULL;  /* sorted name ptrs */
static uint16_t *g_ent_nlen = NULL;
static const u8 **g_ent_exp = NULL;
static uint16_t *g_ent_elen = NULL;
static int g_ent_n = 0;
static const u8 *g_def_bitmap = NULL; /* defined-codepoint bitmap, cp < g_bmp_limit */
static uint32_t g_bmp_limit = 0;
static numref_cb_t g_numref = NULL;

/* char class tables */
static u8 cls_name_start[256], cls_name_cont[256], cls_ws[256],
    cls_ent_start[256], cls_ent_cont[256], cls_nmtok[256], cls_unq[256],
    cls_digit[256], cls_hex[256], cls_cisspace[256], cls_charset_tok[256],
    cls_seg[256], cls_query[256], cls_frag[256], cls_host[256],
    cls_boost_ws[256];

int clex_init(const u8 *ent_blob, int ent_count,
              const u8 *def_bitmap, uint32_t bmp_limit,
              numref_cb_t numref) {
    int i;
    memset(cls_name_start, 0, 256); memset(cls_name_cont, 0, 256);
    memset(cls_ws, 0, 256); memset(cls_ent_start, 0, 256);
    memset(cls_ent_cont, 0, 256); memset(cls_nmtok, 0, 256);
    memset(cls_unq, 0, 256); memset(cls_digit, 0, 256);
    memset(cls_hex, 0, 256); memset(cls_cisspace, 0, 256);
    memset(cls_charset_tok, 0, 256); memset(cls_seg, 0, 256);
    memset(cls_query, 0, 256); memset(cls_frag, 0, 256);
    memset(cls_host, 0, 256); memset(cls_boost_ws, 0, 256);
    for (i = 'A'; i <= 'Z'; i++) cls_name_start[i] = cls_name_cont[i] = 1;
    for (i = 'a'; i <= 'z'; i++) cls_name_start[i] = cls_name_cont[i] = 1;
    cls_name_start['_'] = cls_name_start[':'] = 1;
    for (i = '0'; i <= '9'; i++) cls_name_cont[i] = 1;
    cls_name_cont['_'] = cls_name_cont[':'] = cls_name_cont['.'] = cls_name_cont['-'] = 1;
    cls_ws[' '] = cls_ws['\t'] = cls_ws['\n'] = cls_ws['\r'] = 1;
    /* entity name: [A-Za-z_:][A-Za-z0-9_.:-]*  (same classes as NAME) */
    memcpy(cls_ent_start, cls_name_start, 256);
    memcpy(cls_ent_cont, cls_name_cont, 256);
    /* ATTRVAL rule 318: [A-Za-z0-9._:\-]+ */
    for (i = 'A'; i <= 'Z'; i++) cls_nmtok[i] = 1;
    for (i = 'a'; i <= 'z'; i++) cls_nmtok[i] = 1;
    for (i = '0'; i <= '9'; i++) cls_nmtok[i] = 1;
    cls_nmtok['.'] = cls_nmtok['_'] = cls_nmtok[':'] = cls_nmtok['-'] = 1;
    /* ATTRVAL rule 347: [^ '"\t\n>]+ */
    for (i = 0; i < 256; i++) cls_unq[i] = 1;
    cls_unq[' '] = cls_unq['\''] = cls_unq['"'] = cls_unq['\t'] = cls_unq['\n'] = cls_unq['>'] = 0;
    for (i = '0'; i <= '9'; i++) cls_digit[i] = cls_hex[i] = 1;
    for (i = 'A'; i <= 'F'; i++) cls_hex[i] = 1;
    for (i = 'a'; i <= 'f'; i++) cls_hex[i] = 1;
    cls_cisspace[' '] = cls_cisspace['\t'] = cls_cisspace['\n'] = 1;
    cls_cisspace['\v'] = cls_cisspace['\f'] = cls_cisspace['\r'] = 1;
    /* charset token: not CTL(0-1f,7f), not ()<>@,;:\"/[]?={} and not \t
     * (\t already in CTL) */
    for (i = 0x20; i < 0x7f; i++) cls_charset_tok[i] = 1;
    for (i = 0x80; i < 256; i++) cls_charset_tok[i] = 1;
    {
        const char *sep = "()<>@,;:\\\"/[]?={}";
        for (const char *s = sep; *s; s++) cls_charset_tok[(u8)*s] = 0;
    }
    /* canonical URL screen classes (url.py FAST_NORMALIZED_RE_STR) */
    {
        const char *seg = "!$&'()*+,.-:;=@_~";
        for (i = 'A'; i <= 'Z'; i++) cls_seg[i] = 1;
        for (i = 'a'; i <= 'z'; i++) cls_seg[i] = 1;
        for (i = '0'; i <= '9'; i++) cls_seg[i] = 1;
        for (const char *s = seg; *s; s++) cls_seg[(u8)*s] = 1;
        memcpy(cls_query, cls_seg, 256);
        cls_query['/'] = cls_query['?'] = 1;
        memcpy(cls_frag, cls_query, 256);
        cls_frag['#'] = 1;
        for (i = 'a'; i <= 'z'; i++) cls_host[i] = 1;
        for (i = '0'; i <= '9'; i++) cls_host[i] = 1;
        cls_host['.'] = cls_host['-'] = 1;
    }
    cls_boost_ws[' '] = cls_boost_ws['\t'] = cls_boost_ws['\n'] = 1;
    cls_boost_ws['\v'] = cls_boost_ws['\f'] = cls_boost_ws['\r'] = 1;

    /* entity table: blob of records, binary-search arrays */
    if (g_ent_name) { free(g_ent_name); free(g_ent_nlen); free(g_ent_exp); free(g_ent_elen); }
    g_ent_blob = ent_blob;
    g_ent_n = ent_count;
    g_ent_name = (const u8 **)malloc(sizeof(u8 *) * ent_count);
    g_ent_nlen = (uint16_t *)malloc(sizeof(uint16_t) * ent_count);
    g_ent_exp = (const u8 **)malloc(sizeof(u8 *) * ent_count);
    g_ent_elen = (uint16_t *)malloc(sizeof(uint16_t) * ent_count);
    if (!g_ent_name || !g_ent_nlen || !g_ent_exp || !g_ent_elen) return -1;
    {
        const u8 *p = ent_blob;
        for (i = 0; i < ent_count; i++) {
            uint16_t nl = (uint16_t)(p[0] | (p[1] << 8));
            uint16_t el = (uint16_t)(p[2] | (p[3] << 8));
            p += 4;
            g_ent_name[i] = p; g_ent_nlen[i] = nl; p += nl;
            g_ent_exp[i] = p; g_ent_elen[i] = el; p += el;
        }
    }
    g_def_bitmap = def_bitmap;
    g_bmp_limit = bmp_limit;
    g_numref = numref;
    return 0;
}

static int ent_cmp(const u8 *a, size_t alen, const u8 *b, size_t blen) {
    size_t n = alen < blen ? alen : blen;
    int c = memcmp(a, b, n);
    if (c) return c;
    return (alen > blen) - (alen < blen);
}
/* returns 1 + sets exp/elen when the name is in the table (expansion may be
 * empty); 0 when absent — caller replaces with EMPTY either way (dict.get
 * default b"") but the distinction is kept for clarity */
static int ent_lookup(const u8 *name, size_t nlen, const u8 **exp, size_t *elen) {
    int lo = 0, hi = g_ent_n - 1;
    while (lo <= hi) {
        int mid = (lo + hi) / 2;
        int c = ent_cmp(name, nlen, g_ent_name[mid], g_ent_nlen[mid]);
        if (c == 0) { *exp = g_ent_exp[mid]; *elen = g_ent_elen[mid]; return 1; }
        if (c < 0) hi = mid - 1; else lo = mid + 1;
    }
    *exp = NULL; *elen = 0;
    return 0;
}

/* cp2utf8 semantics (entities.py): surrogates and undefined (Cn) -> empty */
static ssize_t cp_to_utf8(uint32_t cp, u8 *out) {
    if (cp > 0x10FFFF) return 0;
    if (cp >= 0xD800 && cp <= 0xDFFF) return 0;
    if (cp < g_bmp_limit) {
        if (!((g_def_bitmap[cp >> 3] >> (cp & 7)) & 1)) return 0;
        if (cp < 0x80) { out[0] = (u8)cp; return 1; }
        if (cp < 0x800) {
            out[0] = (u8)(0xC0 | (cp >> 6));
            out[1] = (u8)(0x80 | (cp & 0x3F));
            return 2;
        }
        /* bmp_limit <= 0x800 always; defensive fallthrough */
    }
    return g_numref ? g_numref(cp, out) : 0;
}

/* ---- the three entity passes (entities.py replace_all_entities) ---- */
/* named pass: &NAME; -> table expansion (absent -> empty) */
static int pass_named(const u8 *s, size_t n, Buf *out) {
    size_t i = 0;
    while (i < n) {
        const u8 *amp = (const u8 *)memchr(s + i, '&', n - i);
        if (!amp) return buf_add(out, s + i, n - i);
        size_t k = (size_t)(amp - s);
        if (buf_add(out, s + i, k - i)) return -1;
        size_t j = k + 1;
        if (j < n && cls_ent_start[s[j]]) {
            j++;
            while (j < n && cls_ent_cont[s[j]]) j++;
            if (j < n && s[j] == ';') {
                const u8 *exp; size_t elen;
                ent_lookup(s + k + 1, j - (k + 1), &exp, &elen);
                if (elen && buf_add(out, exp, elen)) return -1;
                i = j + 1;
                continue;
            }
        }
        if (buf_add1(out, '&')) return -1;
        i = k + 1;
    }
    return 0;
}
/* dec pass: &#digits; ; hex pass: &#xHEX; (hexflag) */
static int pass_num(const u8 *s, size_t n, int hexflag, Buf *out) {
    size_t i = 0;
    while (i < n) {
        const u8 *amp = (const u8 *)memchr(s + i, '&', n - i);
        if (!amp) return buf_add(out, s + i, n - i);
        size_t k = (size_t)(amp - s);
        if (buf_add(out, s + i, k - i)) return -1;
        size_t j = k + 1;
        int ok = 0;
        if (j < n && s[j] == '#') {
            j++;
            if (hexflag) {
                if (j < n && s[j] == 'x') j++;
                else goto nomatch;
            }
            size_t d0 = j;
            const u8 *cls = hexflag ? cls_hex : cls_digit;
            while (j < n && cls[s[j]]) j++;
            if (j > d0 && j < n && s[j] == ';') {
                /* parse with overflow clamp: python int() is unbounded but
                 * anything > 0x10FFFF becomes empty anyway */
                uint64_t v = 0;
                size_t d = d0;
                while (d < j && v <= 0x10FFFF) {
                    u8 c = s[d++];
                    uint32_t dv = (c <= '9') ? (uint32_t)(c - '0')
                                : (c >= 'a') ? (uint32_t)(c - 'a' + 10)
                                             : (uint32_t)(c - 'A' + 10);
                    v = v * (hexflag ? 16 : 10) + dv;
                }
                if (v <= 0x10FFFF) {
                    u8 tmp[8];
                    ssize_t m = cp_to_utf8((uint32_t)v, tmp);
                    if (m && buf_add(out, tmp, (size_t)m)) return -1;
                }
                i = j + 1;
                ok = 1;
            }
        }
    nomatch:
        if (!ok) {
            if (buf_add1(out, '&')) return -1;
            i = k + 1;
        }
    }
    return 0;
}

/* replace_all_entities into out; returns 0/-1.  Mirrors the python
 * screens: no '&' -> verbatim; numeric passes only when '#' survives. */
static int replace_entities(const u8 *s, size_t n, Buf *scratch1, Buf *scratch2, Buf *out) {
    if (!memchr(s, '&', n)) return buf_add(out, s, n);
    scratch1->len = 0;
    if (pass_named(s, n, scratch1)) return -1;
    if (!memchr(scratch1->p, '#', scratch1->len))
        return buf_add(out, scratch1->p, scratch1->len);
    scratch2->len = 0;
    if (pass_num(scratch1->p, scratch1->len, 0, scratch2)) return -1;
    return pass_num(scratch2->p, scratch2->len, 1, out);
}

/* ---- lexer state ---- */
enum { C_INITIAL, C_CDATA, C_TAG, C_ATTR, C_ATTRVAL, C_SCRIPT, C_MD, C_COM, C_DS };

typedef struct {
    const u8 *buf;
    size_t n, pos;
    int cond;

    Tok *toks;
    int ntoks, captoks;
    Buf tokarena;          /* token contents (entity-replaced) */
    Buf text;              /* joined text_parts */
    Buf title;
    Buf cur_txt;
    Buf cur_url;
    Buf scratch1, scratch2, scratch3;  /* entity passes / resolve */

    /* links: parallel growable arrays of (off,len) into linkarena */
    Buf linkarena;
    size_t *lk_off; size_t *lk_len; size_t *tx_off; size_t *tx_len;
    int nlinks, caplinks;

    Buf rss, rss2, atom, charset;
    int index_flag, follow_flag;
    int warnings;

    int get_text, get_title, inlink, link_nofollow, did_word_break;
    int has_base;          /* base_url given -> screen+callback resolution */
    int cur_url_set;       /* cur_url non-empty flag */
    resolve_cb_t resolve;
    int oom;
} Lex;

static void lex_free_bufs(Lex *L) {
    free(L->toks);
    free(L->tokarena.p); free(L->text.p); free(L->title.p);
    free(L->cur_txt.p); free(L->cur_url.p);
    free(L->scratch1.p); free(L->scratch2.p); free(L->scratch3.p);
    free(L->linkarena.p);
    free(L->lk_off); free(L->lk_len); free(L->tx_off); free(L->tx_len);
    free(L->rss.p); free(L->rss2.p); free(L->atom.p); free(L->charset.p);
}

/* ---- token plumbing ---- */
static void addtoken(Lex *L, int type, const u8 *content, size_t len, int ci) {
    if (L->oom) return;
    if (L->ntoks == L->captoks) {
        int cap = L->captoks ? L->captoks * 2 : 16;
        Tok *nt = (Tok *)realloc(L->toks, sizeof(Tok) * cap);
        if (!nt) { L->oom = 1; return; }
        L->toks = nt; L->captoks = cap;
    }
    size_t off = L->tokarena.len;
    if (replace_entities(content, len, &L->scratch1, &L->scratch2, &L->tokarena)) {
        L->oom = 1; return;
    }
    size_t tlen = L->tokarena.len - off;
    if (ci) {
        u8 *p = L->tokarena.p + off;
        for (size_t i = 0; i < tlen; i++)
            if (p[i] >= 'A' && p[i] <= 'Z') p[i] += 32;
    }
    L->toks[L->ntoks].type = type;
    L->toks[L->ntoks].off = off;
    L->toks[L->ntoks].len = tlen;
    L->ntoks++;
}

/* ---- text/link emission (lexer.py HtmlLexer.text_add etc.) ---- */
static void text_add(Lex *L, const u8 *s, size_t n) {
    if (L->oom) return;
    if (L->get_title && buf_add(&L->title, s, n)) { L->oom = 1; return; }
    if (buf_add(&L->text, s, n)) { L->oom = 1; return; }
    L->did_word_break = 0;
}
static void text_word_break(Lex *L) {
    if (L->oom) return;
    if (!L->did_word_break) {
        if (buf_add1(&L->text, '\n')) { L->oom = 1; return; }
        L->did_word_break = 1;
    }
}
static void link_text_add(Lex *L, const u8 *s, size_t n) {
    text_add(L, s, n);
    if (!L->oom && buf_add(&L->cur_txt, s, n)) L->oom = 1;
}
static void word_break(Lex *L) {
    if (L->oom || !L->get_text) return;
    if (L->inlink) {
        if (buf_add1(&L->cur_txt, ' ')) L->oom = 1;
    } else {
        text_word_break(L);
    }
}

/* canonical-form screen: url.py NORMALIZED_ABS_RE fullmatch (bytes) AND no
 * DOTSEG_RE match.  Returns 1 when the link is provably absolute and
 * normalize()-invariant. */
static int url_canonical(const u8 *s, size_t n) {
    size_t i = 0;
    if (n >= 7 && !memcmp(s, "http://", 7)) i = 7;
    else if (n >= 8 && !memcmp(s, "https://", 8)) i = 8;
    else return 0;
    /* host: [a-z0-9]([a-z0-9.-]*[a-z0-9])? */
    size_t h0 = i;
    while (i < n && cls_host[s[i]]) i++;
    if (i == h0) return 0;
    {
        u8 a = s[h0], b = s[i - 1];
        if (!((a >= 'a' && a <= 'z') || (a >= '0' && a <= '9'))) return 0;
        if (!((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9'))) return 0;
    }
    /* optional port: :[1-9][0-9]{0,3} */
    if (i < n && s[i] == ':') {
        i++;
        if (i >= n || s[i] < '1' || s[i] > '9') return 0;
        i++;
        int k = 0;
        while (i < n && k < 3 && s[i] >= '0' && s[i] <= '9') { i++; k++; }
        /* a 5th digit would not match the regex (which then fails the
         * fullmatch since ':' can't start a path) */
        if (i < n && s[i] >= '0' && s[i] <= '9') return 0;
    }
    /* mandatory path: '/' then SEG/'/' sequence with no empty segment */
    if (i >= n || s[i] != '/') return 0;
    i++;
    {
        int prev_slash = 1;
        while (i < n && (cls_seg[s[i]] || s[i] == '/')) {
            if (s[i] == '/') {
                if (prev_slash) return 0; /* "//" -> empty segment */
                prev_slash = 1;
            } else prev_slash = 0;
            i++;
        }
    }
    /* optional query */
    if (i < n && s[i] == '?') {
        i++;
        while (i < n && cls_query[s[i]]) i++;
    }
    /* optional fragment */
    if (i < n && s[i] == '#') {
        i++;
        while (i < n && cls_frag[s[i]]) i++;
    }
    if (i != n) return 0;
    /* dot-segment screen: /\.{1,2}(?:/|$|\?|#) anywhere */
    for (i = 0; i + 1 < n; i++) {
        if (s[i] == '/' && s[i + 1] == '.') {
            size_t j = i + 2;
            if (j < n && s[j] == '.') j++;
            if (j == n || s[j] == '/' || s[j] == '?' || s[j] == '#') return 0;
        }
    }
    return 1;
}

/* resolve a link via the python callback into dst (clears dst first). */
static ssize_t do_resolve(Lex *L, const u8 *s, size_t n, int mode, Buf *dst) {
    dst->len = 0;
    if (buf_reserve(dst, 4096)) { L->oom = 1; return -2; }
    ssize_t r = L->resolve(s, (ssize_t)n, mode, dst->p, (ssize_t)dst->cap);
    if (r > (ssize_t)dst->cap) {
        if (buf_reserve(dst, (size_t)r)) { L->oom = 1; return -2; }
        r = L->resolve(s, (ssize_t)n, mode, dst->p, (ssize_t)dst->cap);
    }
    if (r >= 0) dst->len = (size_t)r;
    return r;
}

static void link_add(Lex *L, const u8 *s, size_t n) {
    if (L->oom) return;
    if (L->has_base) {
        if (url_canonical(s, n)) {
            L->cur_url.len = 0;
            if (buf_add(&L->cur_url, s, n)) { L->oom = 1; return; }
            L->cur_url_set = (n > 0);
            return;
        }
        ssize_t r = do_resolve(L, s, n, 0, &L->cur_url);
        if (r == -2) return;
        if (r < 0) {
            L->cur_url.len = 0;
            L->cur_txt.len = 0;
            L->cur_url_set = 0;
        } else {
            L->cur_url_set = (L->cur_url.len > 0);
        }
    } else {
        L->cur_url.len = 0;
        if (buf_add(&L->cur_url, s, n)) { L->oom = 1; return; }
        L->cur_url_set = (n > 0);
    }
}

static void submit_link(Lex *L) {
    if (L->oom) return;
    if (L->cur_url_set) {
        if (L->nlinks == L->caplinks) {
            int cap = L->caplinks ? L->caplinks * 2 : 8;
            size_t *a = (size_t *)realloc(L->lk_off, sizeof(size_t) * cap);
            size_t *b = (size_t *)realloc(L->lk_len, sizeof(size_t) * cap);
            size_t *c = (size_t *)realloc(L->tx_off, sizeof(size_t) * cap);
            size_t *d = (size_t *)realloc(L->tx_len, sizeof(size_t) * cap);
            if (!a || !b || !c || !d) {
                L->oom = 1;
                if (a) L->lk_off = a; if (b) L->lk_len = b;
                if (c) L->tx_off = c; if (d) L->tx_len = d;
                return;
            }
            L->lk_off = a; L->lk_len = b; L->tx_off = c; L->tx_len = d;
            L->caplinks = cap;
        }
        /* strip bytes <= 0x08 while copying (HTML_lexer.cc:822-830) */
        size_t uo = L->linkarena.len;
        for (size_t i = 0; i < L->cur_url.len; i++)
            if (L->cur_url.p[i] > 0x08)
                if (buf_add1(&L->linkarena, L->cur_url.p[i])) { L->oom = 1; return; }
        size_t ul = L->linkarena.len - uo;
        size_t to = L->linkarena.len;
        for (size_t i = 0; i < L->cur_txt.len; i++)
            if (L->cur_txt.p[i] > 0x08)
                if (buf_add1(&L->linkarena, L->cur_txt.p[i])) { L->oom = 1; return; }
        size_t tl = L->linkarena.len - to;
        L->lk_off[L->nlinks] = uo; L->lk_len[L->nlinks] = ul;
        L->tx_off[L->nlinks] = to; L->tx_len[L->nlinks] = tl;
        L->nlinks++;
    }
    L->cur_url.len = 0; L->cur_url_set = 0;
    L->cur_txt.len = 0;
}

/* ---- tag ops ---- */
#define TOKP(L, i) ((L)->tokarena.p + (L)->toks[i].off)
#define TOKL(L, i) ((L)->toks[i].len)

static int tok_is(Lex *L, int i, const char *s) {
    size_t n = strlen(s);
    return TOKL(L, i) == n && !memcmp(TOKP(L, i), s, n);
}
static int tok_startswith(Lex *L, int i, const char *s) {
    size_t n = strlen(s);
    return TOKL(L, i) >= n && !memcmp(TOKP(L, i), s, n);
}

static void op_body(Lex *L) { L->get_text = 1; word_break(L); }
static void op_body_c(Lex *L) { L->get_text = 0; }
static void op_script(Lex *L) { L->get_text = 0; }
static void op_script_c(Lex *L) { if (!L->get_text) L->get_text = 1; }
static void op_title(Lex *L) { L->get_text = 1; L->get_title = 1; }
static void op_title_c(Lex *L) { L->get_title = 0; L->get_text = 0; }

static void op_a(Lex *L) {
    if (!L->get_text) return;
    for (int i = 0; i < L->ntoks; i++) {
        int has_next = (i + 1 < L->ntoks);
        if (L->toks[i].type == T_ATTRNAME && tok_startswith(L, i, "href") &&
            has_next && L->toks[i + 1].type == T_LITERAL) {
            link_add(L, TOKP(L, i + 1), TOKL(L, i + 1));
            L->inlink = 1;
        } else if (L->toks[i].type == T_ATTRNAME && tok_startswith(L, i, "rel") &&
                   has_next && L->toks[i + 1].type == T_LITERAL) {
            /* re.split(rb'[" ]+', val): tokens between runs of '"'/' ' */
            const u8 *v = TOKP(L, i + 1);
            size_t vn = TOKL(L, i + 1), j = 0;
            while (j < vn) {
                while (j < vn && (v[j] == '"' || v[j] == ' ')) j++;
                size_t s0 = j;
                while (j < vn && v[j] != '"' && v[j] != ' ') j++;
                if (j - s0 == 8) {
                    u8 low[8];
                    for (int k = 0; k < 8; k++) {
                        u8 c = v[s0 + k];
                        low[k] = (c >= 'A' && c <= 'Z') ? c + 32 : c;
                    }
                    if (!memcmp(low, "nofollow", 8)) L->link_nofollow = 1;
                }
            }
        }
    }
}
static void op_a_c(Lex *L) {
    if (L->link_nofollow) {
        L->inlink = 0;
        L->link_nofollow = 0;
        return;
    }
    if (L->inlink) { submit_link(L); L->inlink = 0; }
}
static void op_frame(Lex *L) {
    if (!L->get_text) return;
    for (int i = 0; i < L->ntoks; i++) {
        if (L->toks[i].type == T_ATTRNAME && tok_startswith(L, i, "src") &&
            i + 1 < L->ntoks && L->toks[i + 1].type == T_LITERAL) {
            link_add(L, TOKP(L, i + 1), TOKL(L, i + 1));
            L->inlink = 1;
        }
    }
    word_break(L);
}
static void op_frame_c(Lex *L) {
    if (L->inlink) { submit_link(L); L->inlink = 0; }
    word_break(L);
}

/* tag_map: ATTRNAME followed by LITERAL, later wins.  Small linear scan
 * helper: find the LAST LITERAL value for an exact attr name. */
static int tag_map_get(Lex *L, const char *name, const u8 **val, size_t *vlen) {
    int found = 0;
    size_t n = strlen(name);
    for (int i = 0; i + 1 < L->ntoks; i++) {
        if (L->toks[i].type == T_ATTRNAME && L->toks[i + 1].type == T_LITERAL &&
            TOKL(L, i) == n && !memcmp(TOKP(L, i), name, n)) {
            *val = TOKP(L, i + 1);
            *vlen = TOKL(L, i + 1);
            found = 1;
        }
    }
    return found;
}

static void meta_name_robots(Lex *L, const u8 *v, size_t n) {
    size_t j = 0;
    while (j < n) {
        while (j < n && (v[j] == ',' || v[j] == ' ')) j++;
        size_t s0 = j;
        while (j < n && v[j] != ',' && v[j] != ' ') j++;
        size_t tl = j - s0;
        if (!tl) continue;
        u8 low[16];
        if (tl > 16) continue;
        for (size_t k = 0; k < tl; k++) {
            u8 c = v[s0 + k];
            low[k] = (c >= 'A' && c <= 'Z') ? c + 32 : c;
        }
        if (tl == 5 && !memcmp(low, "index", 5)) L->index_flag = 1;
        else if (tl == 6 && !memcmp(low, "follow", 6)) L->follow_flag = 1;
        else if (tl == 3 && !memcmp(low, "all", 3)) { L->follow_flag = 1; L->index_flag = 1; return; }
        else if (tl == 7 && !memcmp(low, "noindex", 7)) L->index_flag = 0;
        else if (tl == 8 && !memcmp(low, "nofollow", 8)) L->follow_flag = 0;
        else if (tl == 4 && !memcmp(low, "none", 4)) { L->follow_flag = 0; L->index_flag = 0; return; }
    }
}

static int ascii_ieq(const u8 *a, size_t alen, const char *b) {
    size_t n = strlen(b);
    if (alen != n) return 0;
    for (size_t i = 0; i < n; i++) {
        u8 c = a[i];
        if (c >= 'A' && c <= 'Z') c += 32;
        if (c != (u8)b[i]) return 0;
    }
    return 1;
}

static void op_meta(Lex *L) {
    const u8 *v; size_t vn;
    if (tag_map_get(L, "name", &v, &vn) && ascii_ieq(v, vn, "robots")) {
        const u8 *c; size_t cn;
        if (tag_map_get(L, "content", &c, &cn)) meta_name_robots(L, c, cn);
    }
    if (tag_map_get(L, "http-equiv", &v, &vn)) {
        const u8 *c; size_t cn;
        if (ascii_ieq(v, vn, "content-type") && tag_map_get(L, "content", &c, &cn)) {
            /* _CHARSET_RE.search: first "charset=" followed by >=1 token char */
            for (size_t i = 0; i + 8 <= cn; i++) {
                if (!memcmp(c + i, "charset=", 8)) {
                    size_t j = i + 8, s0 = j;
                    while (j < cn && cls_charset_tok[c[j]]) j++;
                    if (j > s0) {
                        /* strip BOOST_TRIM both ends */
                        size_t a = s0, b = j;
                        while (a < b && cls_boost_ws[c[a]]) a++;
                        while (b > a && cls_boost_ws[c[b - 1]]) b--;
                        L->charset.len = 0;
                        if (buf_add(&L->charset, c + a, b - a)) L->oom = 1;
                        break;
                    }
                }
            }
        } else if (ascii_ieq(v, vn, "refresh") && tag_map_get(L, "content", &c, &cn)) {
            /* ^\d+; url=(.+)$ with re.I ('$' also matches before a final \n) */
            size_t end = cn;
            if (end && c[end - 1] == '\n') end--;
            size_t j = 0;
            while (j < end && cls_digit[c[j]]) j++;
            if (j > 0 && j + 6 <= end && c[j] == ';' && c[j + 1] == ' ') {
                u8 u0 = c[j + 2] | 32, r0 = c[j + 3] | 32, l0 = c[j + 4] | 32;
                if (u0 == 'u' && r0 == 'r' && l0 == 'l' && c[j + 5] == '=') {
                    size_t g0 = j + 6;
                    if (g0 < end && !memchr(c + g0, '\n', end - g0)) {
                        link_add(L, c + g0, end - g0);
                        submit_link(L);
                    }
                }
            }
        }
    }
}

static void op_link_tag(Lex *L) {
    const u8 *href; size_t hn;
    if (!tag_map_get(L, "href", &href, &hn)) return;
    const u8 *rel; size_t rn;
    const u8 *typ; size_t tn;
    if (!tag_map_get(L, "rel", &rel, &rn)) return;
    if (!ascii_ieq(rel, rn, "alternate")) return;
    if (!tag_map_get(L, "type", &typ, &tn)) return;
    /* href.strip(BOOST_TRIM) */
    size_t a = 0, b = hn;
    while (a < b && cls_boost_ws[href[a]]) a++;
    while (b > a && cls_boost_ws[href[b - 1]]) b--;
    const u8 *h = href + a;
    size_t n = b - a;
    /* resolve (mode 1: error -> keep original + warn) */
    Buf *dst = &L->scratch3;
    const u8 *out_p; size_t out_n;
    if (L->has_base) {
        if (url_canonical(h, n)) {
            out_p = h; out_n = n;
        } else {
            ssize_t r = do_resolve(L, h, n, 1, dst);
            if (r == -2) return;
            if (r < 0) { out_p = h; out_n = n; L->warnings++; }
            else { out_p = dst->p; out_n = dst->len; }
        }
    } else {
        out_p = h; out_n = n;
    }
    Buf *slot = NULL;
    if (ascii_ieq(typ, tn, "application/rss+xml")) slot = &L->rss2;
    else if (ascii_ieq(typ, tn, "application/atom+xml")) slot = &L->atom;
    else if (ascii_ieq(typ, tn, "text/xml")) slot = &L->rss;
    if (slot) {
        slot->len = 0;
        if (buf_add(slot, out_p, out_n)) L->oom = 1;
    }
}

/* word-break tag set (lexer.py _WORD_BREAK_TAGS) */
static const char *WB_TAGS[] = {
    "applet", "base", "blockquote", "br", "button", "caption", "dd", "div",
    "dfn", "dl", "dt", "fieldset", "form", "h1", "head", "hr", "img",
    "input", "li", "map", "menu", "noframes", "object", "ol", "optgroup",
    "option", "p", "param", "pre", "q", "samp", "select", "table", "tbody",
    "td", "textarea", "tfoot", "th", "thead", "tr", "tt", "ul", "xmp", NULL,
};

static int is_wb_tag(const u8 *s, size_t n) {
    for (int i = 0; WB_TAGS[i]; i++) {
        size_t l = strlen(WB_TAGS[i]);
        if (l == n && !memcmp(s, WB_TAGS[i], n)) return 1;
    }
    return 0;
}

/* dispatch on the FIRST token of the flushed batch (HTML_lexer.cc:730-788) */
static void process(Lex *L) {
    if (L->oom || !L->ntoks) return;
    int t = L->toks[0].type;
    const u8 *c = TOKP(L, 0);
    size_t n = TOKL(L, 0);
    if (t == T_START) {
        if (is_wb_tag(c, n)) word_break(L);
        else if (n == 4 && !memcmp(c, "body", 4)) op_body(L);
        else if (n == 1 && c[0] == 'a') op_a(L);
        else if ((n == 5 && !memcmp(c, "frame", 5)) ||
                 (n == 6 && !memcmp(c, "iframe", 6))) op_frame(L);
        else if (n == 6 && !memcmp(c, "script", 6)) op_script(L);
        else if (n == 5 && !memcmp(c, "style", 5)) op_script(L);
        else if (n == 4 && !memcmp(c, "link", 4)) op_link_tag(L);
        else if (n == 4 && !memcmp(c, "meta", 4)) op_meta(L);
        else if (n == 5 && !memcmp(c, "title", 5)) op_title(L);
    } else if (t == T_END) {
        if (is_wb_tag(c, n)) word_break(L);
        else if (n == 4 && !memcmp(c, "body", 4)) op_body_c(L);
        else if (n == 1 && c[0] == 'a') op_a_c(L);
        else if ((n == 5 && !memcmp(c, "frame", 5)) ||
                 (n == 6 && !memcmp(c, "iframe", 6))) op_frame_c(L);
        else if (n == 6 && !memcmp(c, "script", 6)) op_script_c(L);
        else if (n == 5 && !memcmp(c, "style", 5)) op_script_c(L);
        else if (n == 4 && !memcmp(c, "meta", 4)) word_break(L);
        else if (n == 5 && !memcmp(c, "title", 5)) op_title_c(L);
        /* link close: no-op */
    } else if (t == T_DATA) {
        if (L->get_text) {
            if (L->inlink) link_text_add(L, c, n);
            else text_add(L, c, n);
        }
    }
    L->ntoks = 0;
    L->tokarena.len = 0;
}

/* emit a DATA token + process (lexer.py _data) */
static void emit_data(Lex *L, const u8 *s, size_t n) {
    addtoken(L, T_DATA, s, n, 0);
    process(L);
}

/* rtrim helpers: TRIM_TAIL = {0x20,0x11,\n,\r}; TRIM_TAIL_GT adds '>' */
static size_t rtrim_tail(const u8 *s, size_t n) {
    while (n && (s[n - 1] == 0x20 || s[n - 1] == 0x11 || s[n - 1] == '\n' || s[n - 1] == '\r'))
        n--;
    return n;
}
static size_t rtrim_tail_gt(const u8 *s, size_t n) {
    while (n && (s[n - 1] == 0x20 || s[n - 1] == 0x11 || s[n - 1] == '\n' ||
                 s[n - 1] == '\r' || s[n - 1] == '>'))
        n--;
    return n;
}

/* "script".startswith(low): any prefix of "script" (lexer.py i_stago_name) */
static int is_script_prefix(const u8 *s, size_t n) {
    static const char *script = "script";
    if (n > 6) return 0;
    for (size_t i = 0; i < n; i++) {
        u8 c = s[i];
        if (c >= 'A' && c <= 'Z') c += 32;
        if (c != (u8)script[i]) return 0;
    }
    return 1;
}

/* ---- the scanner (lexer.py HtmlLexer.run) ---- */
static void scan(Lex *L) {
    const u8 *buf = L->buf;
    size_t n = L->n;
    size_t pos = L->pos;
    int cond = L->cond;

    while (pos < n && !L->oom) {
        u8 c = buf[pos];
        switch (cond) {
        case C_INITIAL: {
            if (c != '<' && c != ']') {
                /* rule 277 [^<]+ always wins here (>= any \n run) */
                const u8 *lt = (const u8 *)memchr(buf + pos, '<', n - pos);
                size_t end = lt ? (size_t)(lt - buf) : n;
                emit_data(L, buf + pos, end - pos);
                pos = end;
                continue;
            }
            if (c == ']') {
                /* rule 220 ']]>' wins only on an exact-3 tie with the data
                 * run (lexer.py run() ']' branch) */
                const u8 *lt = (const u8 *)memchr(buf + pos, '<', n - pos);
                size_t end = lt ? (size_t)(lt - buf) : n;
                if (end - pos == 3 && pos + 3 <= n && !memcmp(buf + pos, "]]>", 3)) {
                    L->warnings++;
                    pos += 3;
                } else {
                    emit_data(L, buf + pos, end - pos);
                    pos = end;
                }
                continue;
            }
            /* c == '<': dispatch on second byte */
            if (pos + 1 >= n) { emit_data(L, buf + pos, 1); pos++; continue; }
            u8 c2 = buf[pos + 1];
            if (cls_name_start[c2]) {
                /* rule 230 <NAME ws* */
                size_t j = pos + 2;
                while (j < n && cls_name_cont[buf[j]]) j++;
                while (j < n && cls_ws[buf[j]]) j++;
                size_t nm0 = pos + 1;
                size_t nmlen = rtrim_tail(buf + nm0, j - nm0);
                /* lowered copy for the prefix test / token */
                if (is_script_prefix(buf + nm0, nmlen)) {
                    addtoken(L, T_START, buf + nm0, nmlen, 1);
                    process(L);
                    cond = C_SCRIPT;
                } else {
                    addtoken(L, T_START, buf + nm0, nmlen, 1);
                    cond = C_ATTR;
                }
                pos = j;
                continue;
            }
            if (c2 == '/') {
                u8 c3 = (pos + 2 < n) ? buf[pos + 2] : 0;
                if (pos + 2 < n && cls_name_start[c3]) {
                    /* rule 141 </NAME ws* */
                    size_t j = pos + 3;
                    while (j < n && cls_name_cont[buf[j]]) j++;
                    while (j < n && cls_ws[buf[j]]) j++;
                    size_t nm0 = pos + 2;
                    size_t nmlen = rtrim_tail(buf + nm0, j - nm0);
                    addtoken(L, T_END, buf + nm0, nmlen, 1);
                    cond = C_TAG;
                    pos = j;
                    continue;
                }
                if (pos + 2 < n && c3 == '>') { /* rule 190 </> */
                    L->warnings++;
                    pos += 3;
                    continue;
                }
                emit_data(L, buf + pos, 1);
                pos++;
                continue;
            }
            if (c2 == '!') {
                u8 c3 = (pos + 2 < n) ? buf[pos + 2] : 0;
                if (pos + 2 < n && cls_name_start[c3]) {
                    /* rule 195 <!NAME ws* */
                    size_t j = pos + 3;
                    while (j < n && cls_name_cont[buf[j]]) j++;
                    while (j < n && cls_ws[buf[j]]) j++;
                    addtoken(L, T_MARKUP_DECL, buf + pos, j - pos, 1);
                    cond = C_MD;
                    pos = j;
                    continue;
                }
                if (pos + 2 < n && c3 == '>') { /* rule 202 <!> */
                    process(L);
                    pos += 3;
                    continue;
                }
                if (pos + 3 < n && c3 == '-' && buf[pos + 3] == '-') { /* 207 */
                    cond = C_COM;
                    pos += 4;
                    continue;
                }
                if (pos + 2 < n && c3 == '[') {
                    /* 256 <![CDATA[ (ci, len 9) vs 214 <![ ws* (len 3+ws);
                     * 256 wins iff it matches and is longer */
                    int cd = 0;
                    if (pos + 9 <= n) {
                        static const char *cdata = "cdata[";
                        cd = 1;
                        for (int k = 0; k < 6; k++) {
                            u8 cc = buf[pos + 3 + k];
                            if (cc >= 'A' && cc <= 'Z') cc += 32;
                            if (cc != (u8)cdata[k]) { cd = 0; break; }
                        }
                    }
                    size_t j = pos + 3;
                    while (j < n && cls_ws[buf[j]]) j++;
                    if (cd && 9 > j - pos) {
                        L->warnings++; /* i_cdatao warns */
                        cond = C_CDATA;
                        pos += 9;
                    } else {
                        L->warnings++; /* i_mdo_dso warns */
                        cond = C_DS;
                        pos = j;
                    }
                    continue;
                }
                emit_data(L, buf + pos, 1);
                pos++;
                continue;
            }
            if (c2 == '?') {
                /* rule 225 <\?[^>]*> */
                const u8 *gt = (const u8 *)memchr(buf + pos + 2, '>', n - pos - 2);
                /* [^>]* may not cross a '>' — memchr finds the first, OK */
                if (gt) {
                    size_t end = (size_t)(gt - buf) + 1;
                    addtoken(L, T_PI, buf + pos, end - pos, 0);
                    process(L);
                    pos = end;
                } else {
                    emit_data(L, buf + pos, 1);
                    pos++;
                }
                continue;
            }
            if (c2 == '>') { /* rule 252 <> */
                L->warnings++;
                pos += 2;
                continue;
            }
            emit_data(L, buf + pos, 1);
            pos++;
            continue;
        }
        case C_SCRIPT: {
            if (c != '<') {
                const u8 *lt = (const u8 *)memchr(buf + pos, '<', n - pos);
                pos = lt ? (size_t)(lt - buf) : n;  /* rule 282: discarded */
                continue;
            }
            /* rule 156 </ ws* script(ci) ws* > */
            size_t j = pos + 1;
            if (j < n && buf[j] == '/') {
                j++;
                while (j < n && cls_ws[buf[j]]) j++;
                static const char *script = "script";
                int ok = (j + 6 <= n);
                if (ok) {
                    for (int k = 0; k < 6; k++) {
                        u8 cc = buf[j + k];
                        if (cc >= 'A' && cc <= 'Z') cc += 32;
                        if (cc != (u8)script[k]) { ok = 0; break; }
                    }
                }
                if (ok) {
                    size_t j2 = j + 6;
                    while (j2 < n && cls_ws[buf[j2]]) j2++;
                    if (j2 < n && buf[j2] == '>') {
                        /* s_script_end: text[2:], skip leading 0x20 only,
                         * rtrim TRIM_TAIL_GT, token END ci (no process) */
                        size_t t0 = pos + 2, t1 = j2 + 1;
                        while (t0 < t1 && buf[t0] == 0x20) t0++;
                        size_t tl = rtrim_tail_gt(buf + t0, t1 - t0);
                        addtoken(L, T_END, buf + t0, tl, 1);
                        cond = C_INITIAL;
                        pos = j2 + 1;
                        continue;
                    }
                }
            }
            pos++; /* rule 282 [^\n] alt: single '<' discarded */
            continue;
        }
        case C_TAG: {
            if (c == '>') {
                addtoken(L, T_TAGC, (const u8 *)">", 1, 0);
                process(L);
                cond = C_INITIAL;
                pos++;
                continue;
            }
            if (c == '<') { /* rule 381 t_stago */
                process(L);
                cond = C_INITIAL;
                pos++;
                continue;
            }
            if (c == '\n') { /* rule 474 */
                size_t j = pos + 1;
                while (j < n && (buf[j] == '\n' || buf[j] == '\r')) j++;
                pos = j;
                continue;
            }
            if (c == '\r') {
                /* 388 [^\n] (len1, order 388) vs 474 [\n\r]+ (len>=1): the
                 * run wins only when longer than 1 */
                size_t j = pos + 1;
                while (j < n && (buf[j] == '\n' || buf[j] == '\r')) j++;
                if (j - pos > 1) pos = j;
                else { L->warnings++; pos++; }
                continue;
            }
            L->warnings++; /* rule 388 */
            pos++;
            continue;
        }
        case C_ATTR: {
            if (cls_name_start[c]) {
                /* 299 NAME ws*= ws*  vs  312 NAME ws* (299 extends 312) */
                size_t j = pos + 1;
                while (j < n && cls_name_cont[buf[j]]) j++;
                size_t k = j;
                while (k < n && cls_ws[buf[k]]) k++;
                if (k < n && buf[k] == '=') {
                    k++;
                    while (k < n && cls_ws[buf[k]]) k++;
                    /* a_attrname: strip trailing '=' / C-isspace */
                    size_t tl = k - pos;
                    const u8 *t = buf + pos;
                    while (tl && (t[tl - 1] == '=' || cls_cisspace[t[tl - 1]])) tl--;
                    addtoken(L, T_ATTRNAME, t, tl, 1);
                    cond = C_ATTRVAL;
                    pos = k;
                } else {
                    /* a_name: token includes trailing ws */
                    addtoken(L, T_NAME, buf + pos, k - pos, 1);
                    pos = k;
                }
                continue;
            }
            if (c == '>') {
                addtoken(L, T_TAGC, (const u8 *)">", 1, 0);
                process(L);
                cond = C_INITIAL;
                pos++;
                continue;
            }
            if (c == '/') {
                if (pos + 1 < n && buf[pos + 1] == '>') { /* 373 /> */
                    addtoken(L, T_TAGC, (const u8 *)"/>", 2, 0);
                    process(L);
                    cond = C_INITIAL;
                    pos += 2;
                } else {
                    L->warnings++;
                    pos++;
                }
                continue;
            }
            if (c == '<') {
                process(L);
                cond = C_INITIAL;
                pos++;
                continue;
            }
            if (c == '\n') {
                size_t j = pos + 1;
                while (j < n && (buf[j] == '\n' || buf[j] == '\r')) j++;
                pos = j;
                continue;
            }
            if (c == '\r') {
                size_t j = pos + 1;
                while (j < n && (buf[j] == '\n' || buf[j] == '\r')) j++;
                if (j - pos > 1) pos = j;
                else { L->warnings++; pos++; }
                continue;
            }
            L->warnings++;
            pos++;
            continue;
        }
        case C_ATTRVAL: {
            /* ordered rules: 318 nmtok+ws, 324 quoted+ws, 347 unq+ws,
             * 360 '>', 373 '/>', 381 '<', 388 [^\n], 474 [\n\r]+.
             * Compute candidate lengths, pick longest, tie -> lowest order. */
            size_t len318 = 0, len324 = 0, len347 = 0, len360 = 0,
                   len373 = 0, len381 = 0, len388 = 0, len474 = 0;
            if (cls_nmtok[c]) {
                size_t j = pos + 1;
                while (j < n && cls_nmtok[buf[j]]) j++;
                while (j < n && cls_ws[buf[j]]) j++;
                len318 = j - pos;
            }
            if (c == '"' || c == '\'') {
                const u8 *q = (const u8 *)memchr(buf + pos + 1, c, n - pos - 1);
                if (q) {
                    size_t j = (size_t)(q - buf) + 1;
                    while (j < n && cls_ws[buf[j]]) j++;
                    len324 = j - pos;
                }
            }
            if (cls_unq[c]) {
                size_t j = pos + 1;
                while (j < n && cls_unq[buf[j]]) j++;
                while (j < n && cls_ws[buf[j]]) j++;
                len347 = j - pos;
            }
            if (c == '>') len360 = 1;
            if (c == '/' && pos + 1 < n && buf[pos + 1] == '>') len373 = 2;
            if (c == '<') len381 = 1;
            if (c != '\n') len388 = 1;
            if (c == '\n' || c == '\r') {
                size_t j = pos + 1;
                while (j < n && (buf[j] == '\n' || buf[j] == '\r')) j++;
                len474 = j - pos;
            }
            /* longest match, ties by rule order (ascending) */
            size_t best = 0;
            int rule = 0;
            struct { size_t len; int order; } cand[8] = {
                {len318, 318}, {len324, 324}, {len347, 347}, {len360, 360},
                {len373, 373}, {len381, 381}, {len388, 388}, {len474, 474},
            };
            for (int k = 0; k < 8; k++)
                if (cand[k].len > best) { best = cand[k].len; rule = cand[k].order; }
            switch (rule) {
            case 318:
                addtoken(L, T_NMTOKEN, buf + pos, best, 0);
                cond = C_ATTR;
                break;
            case 324: {
                /* v_literal: rtrim TRIM_TAIL, then strip one trailing then
                 * one leading quote */
                const u8 *t = buf + pos;
                size_t tl = rtrim_tail(t, best);
                if (tl && (t[tl - 1] == '"' || t[tl - 1] == '\'')) tl--;
                if (tl && (t[0] == '"' || t[0] == '\'')) { t++; tl--; }
                addtoken(L, T_LITERAL, t, tl, 0);
                cond = C_ATTR;
                break;
            }
            case 347: {
                size_t tl = rtrim_tail(buf + pos, best);
                addtoken(L, T_LITERAL, buf + pos, tl, 0);
                cond = C_ATTR;
                break;
            }
            case 360:
                process(L); /* v_tagc: no TAGC token */
                cond = C_INITIAL;
                break;
            case 373:
                addtoken(L, T_TAGC, (const u8 *)"/>", 2, 0);
                process(L);
                cond = C_INITIAL;
                break;
            case 381:
                process(L);
                cond = C_INITIAL;
                break;
            case 388:
                L->warnings++;
                break;
            case 474:
                break;
            default: /* no rule matched (c=='\n' with len474 run) */
                break;
            }
            pos += best ? best : 1;
            continue;
        }
        case C_MD: {
            /* 404 %NAME(;|\n)? ws*, 412 [0-9]+ ws*, 416 NAME ws*,
             * 420 quoted ws*, 424 '>', 438 '[', 446 [^\n], 474 [\n\r]+ */
            if (c == '%') {
                if (pos + 1 < n && cls_name_start[buf[pos + 1]]) {
                    size_t j = pos + 2;
                    while (j < n && cls_name_cont[buf[j]]) j++;
                    if (j < n && (buf[j] == ';' || buf[j] == '\n')) j++;
                    while (j < n && cls_ws[buf[j]]) j++;
                    L->warnings++;
                    pos = j;
                } else {
                    L->warnings++; /* 446 single char */
                    pos++;
                }
                continue;
            }
            if (cls_digit[c]) {
                /* 412 digits+ws vs 416: digits aren't name-start -> 412 */
                size_t j = pos + 1;
                while (j < n && cls_digit[buf[j]]) j++;
                while (j < n && cls_ws[buf[j]]) j++;
                /* 416 can't match here: digits are not NAME-start chars */
                addtoken(L, T_NUMBER, buf + pos, j - pos, 0);
                pos = j;
                continue;
            }
            if (cls_name_start[c]) {
                size_t j = pos + 1;
                while (j < n && cls_name_cont[buf[j]]) j++;
                while (j < n && cls_ws[buf[j]]) j++;
                addtoken(L, T_NAME, buf + pos, j - pos, 1);
                pos = j;
                continue;
            }
            if (c == '"' || c == '\'') {
                const u8 *q = (const u8 *)memchr(buf + pos + 1, c, n - pos - 1);
                if (q) {
                    size_t j = (size_t)(q - buf) + 1;
                    while (j < n && cls_ws[buf[j]]) j++;
                    addtoken(L, T_LITERAL, buf + pos, j - pos, 0);
                    pos = j;
                } else {
                    L->warnings++; /* 446 */
                    pos++;
                }
                continue;
            }
            if (c == '>') {
                addtoken(L, T_TAGC, (const u8 *)">", 1, 0);
                process(L);
                cond = C_INITIAL;
                pos++;
                continue;
            }
            if (c == '[') {
                cond = C_DS;
                pos++;
                continue;
            }
            if (c == '\n') {
                size_t j = pos + 1;
                while (j < n && (buf[j] == '\n' || buf[j] == '\r')) j++;
                pos = j;
                continue;
            }
            if (c == '\r') {
                size_t j = pos + 1;
                while (j < n && (buf[j] == '\n' || buf[j] == '\r')) j++;
                if (j - pos > 1) pos = j;
                else { L->warnings++; pos++; }
                continue;
            }
            L->warnings++;
            pos++;
            continue;
        }
        case C_COM: {
            /* 430 -- ws* > ; 442 [^\n]; 474 [\n\r]+ */
            if (c == '-' && pos + 1 < n && buf[pos + 1] == '-') {
                size_t j = pos + 2;
                while (j < n && cls_ws[buf[j]]) j++;
                if (j < n && buf[j] == '>') {
                    process(L);
                    cond = C_INITIAL;
                    pos = j + 1;
                    continue;
                }
            }
            if (c == '\n' || c == '\r') {
                size_t j = pos + 1;
                while (j < n && (buf[j] == '\n' || buf[j] == '\r')) j++;
                /* 442 [^\n] matches '\r' single; tie at len1 -> 442 (noop
                 * either way) */
                pos = (j - pos > 1 || c == '\n') ? j : pos + 1;
                continue;
            }
            pos++; /* 442 noop */
            continue;
        }
        case C_DS: {
            /* 460 ]]> ; 464 ] ; 466 [^\]]+ warn; 474; 478 */
            if (c == ']') {
                if (pos + 2 < n && buf[pos + 1] == ']' && buf[pos + 2] == '>') {
                    cond = C_INITIAL;
                    pos += 3;
                } else {
                    cond = C_COM; /* d_dsc */
                    pos++;
                }
                continue;
            }
            {
                /* 466 [^\]]+ -> warn (always >= any \n run) */
                size_t j = pos;
                while (j < n && buf[j] != ']') j++;
                L->warnings++;
                pos = j;
            }
            continue;
        }
        case C_CDATA: {
            /* 262 [^\n]*(?=]]>) efflen=len+3; 269 ]]>; 470 [^\n] warn; 474 */
            size_t line_end = pos;
            while (line_end < n && buf[line_end] != '\n') line_end++;
            /* last "]]>" start in [pos, line_end) (greedy backtrack) */
            ssize_t found = -1;
            if (line_end >= pos + 3) {
                for (size_t j = line_end - 2; j-- > pos;) {
                    /* scan j from line_end-3 down to pos */
                    if (buf[j] == ']' && buf[j + 1] == ']' && buf[j + 2] == '>') {
                        found = (ssize_t)j;
                        break;
                    }
                }
                /* also check j == pos (loop above stops before pos) */
                if (found < 0 && pos + 2 < n && buf[pos] == ']' &&
                    buf[pos + 1] == ']' && buf[pos + 2] == '>')
                    found = (ssize_t)pos;
            }
            if (found >= 0) {
                /* efflen 262 = (found-pos)+3 >= 3 = len 269; tie -> 262.
                 * cd_data: process() + INITIAL, consume found-pos */
                process(L);
                cond = C_INITIAL;
                pos = (size_t)found;
                continue;
            }
            if (pos + 2 < n && buf[pos] == ']' && buf[pos + 1] == ']' &&
                buf[pos + 2] == '>' ) {
                /* only reachable when "]]>") spans past line_end — it cannot
                 * (no \n inside) — defensive */
                cond = C_INITIAL;
                pos += 3;
                continue;
            }
            if (c == '\n') {
                size_t j = pos + 1;
                while (j < n && (buf[j] == '\n' || buf[j] == '\r')) j++;
                pos = j;
                continue;
            }
            if (c == '\r') {
                size_t j = pos + 1;
                while (j < n && (buf[j] == '\n' || buf[j] == '\r')) j++;
                if (j - pos > 1) pos = j;
                else { L->warnings++; pos++; }
                continue;
            }
            L->warnings++; /* 470 per char */
            pos++;
            continue;
        }
        default:
            pos++;
        }
    }
    L->pos = pos;
    L->cond = cond;
    /* EOF: pending tokens dropped (html.ll:483-487) */
}

/* ---- public API ---- */
typedef struct {
    const u8 *text; size_t text_len;
    const u8 *title; size_t title_len;
    const u8 *charset; size_t charset_len;
    const u8 *rss; size_t rss_len;
    const u8 *rss2; size_t rss2_len;
    const u8 *atom; size_t atom_len;
    int32_t index_flag, follow_flag, warnings, nlinks;
    const u8 *linkarena;
    const size_t *lk_off; const size_t *lk_len;
    const size_t *tx_off; const size_t *tx_len;
    void *handle;
} ClexResult;

int clex_run(const u8 *buf, size_t n, int has_base, resolve_cb_t resolve,
             ClexResult *out) {
    Lex *L = (Lex *)calloc(1, sizeof(Lex));
    if (!L) return -1;
    L->buf = buf;
    L->n = n;
    L->cond = C_INITIAL;
    L->get_text = 1;
    L->index_flag = 1;
    L->follow_flag = 1;
    L->has_base = has_base;
    L->resolve = resolve;
    scan(L);
    if (L->oom) {
        lex_free_bufs(L);
        free(L);
        return -1;
    }
    out->text = L->text.p; out->text_len = L->text.len;
    out->title = L->title.p; out->title_len = L->title.len;
    out->charset = L->charset.p; out->charset_len = L->charset.len;
    out->rss = L->rss.p; out->rss_len = L->rss.len;
    out->rss2 = L->rss2.p; out->rss2_len = L->rss2.len;
    out->atom = L->atom.p; out->atom_len = L->atom.len;
    out->index_flag = L->index_flag;
    out->follow_flag = L->follow_flag;
    out->warnings = L->warnings;
    out->nlinks = L->nlinks;
    out->linkarena = L->linkarena.p;
    out->lk_off = L->lk_off; out->lk_len = L->lk_len;
    out->tx_off = L->tx_off; out->tx_len = L->tx_len;
    out->handle = L;
    return 0;
}

void clex_free(ClexResult *out) {
    if (out && out->handle) {
        Lex *L = (Lex *)out->handle;
        lex_free_bufs(L);
        free(L);
        out->handle = NULL;
    }
}
