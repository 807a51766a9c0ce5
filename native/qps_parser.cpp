// Native QPS (MPS + QUADOBJ) parser for the Maros-Meszaros data loader.
//
// Plays the role the reference's C sparse-ingestion layer plays
// (src/cs.c triplet handling): the host-side hot path of benchmark
// ingestion.  Pure tokenizing work — orders of magnitude faster than the
// Python fallback in osqp_tpu/io/qps.py, with byte-identical semantics
// (sections NAME/ROWS/COLUMNS/RHS/RANGES/BOUNDS/QUADOBJ/QMATRIX;
// the classic "UP with negative value implies free lower bound" quirk;
// RANGES widening by row type).
//
// C ABI: qps_parse() returns an opaque handle; qps_dims() reports array
// sizes; qps_fill() copies results into caller-allocated buffers;
// qps_last_error() returns a static message when qps_parse returns null.
//
// Build: g++ -O2 -shared -fPIC -o _qps_native.so qps_parser.cpp

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

struct Triplet {
  int64_t i, j;
  double v;
};

struct Parsed {
  std::string name;
  int64_t n = 0, m = 0;
  std::vector<Triplet> a;        // constraint matrix entries
  std::vector<Triplet> quad;     // QUADOBJ entries (canonical i<=j)
  std::vector<double> q_lin;     // (n)
  std::vector<double> l_rows, u_rows;  // (m)
  std::vector<double> lo, up;    // (n) variable bounds
  double obj_rhs = 0.0;
};

thread_local std::string g_error;

struct Tok {
  const char* p;
  size_t len;
  std::string str() const { return std::string(p, len); }
};

// Split a line into whitespace-separated tokens (no allocation per token).
inline int tokenize(const char* s, const char* end, Tok* out, int max_tok) {
  int k = 0;
  while (s < end && k < max_tok) {
    while (s < end && (*s == ' ' || *s == '\t' || *s == '\r')) ++s;
    if (s >= end) break;
    const char* st = s;
    while (s < end && *s != ' ' && *s != '\t' && *s != '\r') ++s;
    out[k].p = st;
    out[k].len = static_cast<size_t>(s - st);
    ++k;
  }
  return k;
}

inline bool tok_eq(const Tok& t, const char* lit) {
  size_t n = std::strlen(lit);
  if (t.len != n) return false;
  for (size_t i = 0; i < n; ++i)
    if (std::toupper(static_cast<unsigned char>(t.p[i])) != lit[i]) return false;
  return true;
}

inline double tok_num(const Tok& t) {
  // strtod needs NUL termination; tokens are short, copy to stack.
  char buf[64];
  size_t n = t.len < 63 ? t.len : 63;
  std::memcpy(buf, t.p, n);
  buf[n] = 0;
  return std::strtod(buf, nullptr);
}

struct NameMap {
  std::unordered_map<std::string, int64_t> map;
  int64_t get_or_add(const Tok& t) {
    auto r = map.emplace(t.str(), static_cast<int64_t>(map.size()));
    return r.first->second;
  }
  const int64_t* find(const Tok& t) const {
    auto it = map.find(t.str());
    return it == map.end() ? nullptr : &it->second;
  }
};

enum Section {
  SEC_NONE,
  SEC_NAME,
  SEC_ROWS,
  SEC_COLUMNS,
  SEC_RHS,
  SEC_RANGES,
  SEC_BOUNDS,
  SEC_QUAD,
  SEC_OBJSENSE,
  SEC_END
};

bool parse_impl(const char* text, size_t len, Parsed* out) {
  Section sec = SEC_NONE;
  std::string obj_row;
  bool have_obj_row = false;

  NameMap rows;  // constraint rows only (objective excluded)
  NameMap cols;
  std::vector<char> row_type;      // 'E' | 'L' | 'G' per row
  std::vector<double> rhs;         // per row, default 0
  std::vector<double> range_val;   // per row
  std::vector<char> has_range;     // per row
  std::vector<char> explicit_lo;   // per col

  auto ensure_col = [&](int64_t j) {
    if (static_cast<int64_t>(out->q_lin.size()) <= j) {
      out->q_lin.resize(j + 1, 0.0);
      out->lo.resize(j + 1, 0.0);
      out->up.resize(j + 1, kInf);
      explicit_lo.resize(j + 1, 0);
    }
  };

  const char* p = text;
  const char* end = text + len;
  Tok toks[64];

  while (p < end) {
    const char* line = p;
    const char* nl = static_cast<const char*>(std::memchr(p, '\n', end - p));
    const char* le = nl ? nl : end;
    p = nl ? nl + 1 : end;

    if (line >= le || *line == '*') continue;
    bool is_header = !(line[0] == ' ' || line[0] == '\t');
    int nt = tokenize(line, le, toks, 64);
    if (nt == 0) continue;

    if (is_header) {
      if (tok_eq(toks[0], "NAME")) {
        if (nt > 1) out->name = toks[1].str();
        sec = SEC_NAME;
      } else if (tok_eq(toks[0], "ROWS")) {
        sec = SEC_ROWS;
      } else if (tok_eq(toks[0], "COLUMNS")) {
        sec = SEC_COLUMNS;
      } else if (tok_eq(toks[0], "RHS")) {
        sec = SEC_RHS;
      } else if (tok_eq(toks[0], "RANGES")) {
        sec = SEC_RANGES;
      } else if (tok_eq(toks[0], "BOUNDS")) {
        sec = SEC_BOUNDS;
      } else if (tok_eq(toks[0], "QUADOBJ") || tok_eq(toks[0], "QMATRIX")) {
        sec = SEC_QUAD;
      } else if (tok_eq(toks[0], "OBJSENSE")) {
        sec = SEC_OBJSENSE;
      } else if (tok_eq(toks[0], "ENDATA")) {
        sec = SEC_END;
      } else {
        g_error = "unknown QPS section: " + toks[0].str();
        return false;
      }
      continue;
    }

    switch (sec) {
      case SEC_ROWS: {
        if (nt < 2) break;
        if (tok_eq(toks[0], "N")) {
          if (!have_obj_row) {
            obj_row = toks[1].str();
            have_obj_row = true;
          }
        } else {
          int64_t i = rows.get_or_add(toks[1]);
          if (static_cast<int64_t>(row_type.size()) <= i) {
            row_type.resize(i + 1);
            rhs.resize(i + 1, 0.0);
            range_val.resize(i + 1, 0.0);
            has_range.resize(i + 1, 0);
          }
          row_type[i] =
              static_cast<char>(std::toupper(static_cast<unsigned char>(toks[0].p[0])));
        }
        break;
      }
      case SEC_COLUMNS: {
        int64_t j = cols.get_or_add(toks[0]);
        ensure_col(j);
        for (int k = 1; k + 1 < nt; k += 2) {
          double v = tok_num(toks[k + 1]);
          if (have_obj_row && toks[k].str() == obj_row) {
            out->q_lin[j] += v;
          } else {
            const int64_t* ri = rows.find(toks[k]);
            if (!ri) {
              g_error = "COLUMNS references unknown row: " + toks[k].str();
              return false;
            }
            out->a.push_back({*ri, j, v});
          }
        }
        break;
      }
      case SEC_RHS: {
        for (int k = 1; k + 1 < nt; k += 2) {
          double v = tok_num(toks[k + 1]);
          if (have_obj_row && toks[k].str() == obj_row) {
            out->obj_rhs = v;
          } else {
            const int64_t* ri = rows.find(toks[k]);
            if (ri) rhs[*ri] = v;
          }
        }
        break;
      }
      case SEC_RANGES: {
        for (int k = 1; k + 1 < nt; k += 2) {
          const int64_t* ri = rows.find(toks[k]);
          if (ri) {
            range_val[*ri] = tok_num(toks[k + 1]);
            has_range[*ri] = 1;
          }
        }
        break;
      }
      case SEC_BOUNDS: {
        if (nt < 3) break;
        int64_t j = cols.get_or_add(toks[2]);
        ensure_col(j);
        double v = nt > 3 ? tok_num(toks[3]) : 0.0;
        if (tok_eq(toks[0], "UP")) {
          out->up[j] = v;
          if (v < 0 && !explicit_lo[j]) out->lo[j] = -kInf;
        } else if (tok_eq(toks[0], "LO")) {
          out->lo[j] = v;
          explicit_lo[j] = 1;
        } else if (tok_eq(toks[0], "FX")) {
          out->lo[j] = v;
          out->up[j] = v;
          explicit_lo[j] = 1;
        } else if (tok_eq(toks[0], "FR")) {
          out->lo[j] = -kInf;
          out->up[j] = kInf;
        } else if (tok_eq(toks[0], "MI")) {
          out->lo[j] = -kInf;
        } else if (tok_eq(toks[0], "PL")) {
          out->up[j] = kInf;
        } else if (tok_eq(toks[0], "BV")) {
          out->lo[j] = 0.0;
          out->up[j] = 1.0;
          explicit_lo[j] = 1;
        } else {
          g_error = "unsupported bound type: " + toks[0].str();
          return false;
        }
        break;
      }
      case SEC_QUAD: {
        if (nt < 3) break;
        int64_t i = cols.get_or_add(toks[0]);
        int64_t j = cols.get_or_add(toks[1]);
        ensure_col(i > j ? i : j);
        double v = tok_num(toks[2]);
        out->quad.push_back({i < j ? i : j, i < j ? j : i, v});
        break;
      }
      default:
        break;
    }
  }

  out->n = static_cast<int64_t>(out->q_lin.size());
  out->m = static_cast<int64_t>(row_type.size());
  out->l_rows.resize(out->m);
  out->u_rows.resize(out->m);
  for (int64_t i = 0; i < out->m; ++i) {
    double b = rhs[i];
    double lb, ub;
    switch (row_type[i]) {
      case 'E': lb = b; ub = b; break;
      case 'L': lb = -kInf; ub = b; break;
      case 'G': lb = b; ub = kInf; break;
      default:
        g_error = "unknown row type";
        return false;
    }
    if (has_range[i]) {
      double r = range_val[i];
      if (row_type[i] == 'L') lb = b - std::fabs(r);
      else if (row_type[i] == 'G') ub = b + std::fabs(r);
      else if (r >= 0) ub = b + r;
      else lb = b + r;
    }
    out->l_rows[i] = lb;
    out->u_rows[i] = ub;
  }
  return true;
}

}  // namespace

extern "C" {

void* qps_parse(const char* text, int64_t len) {
  g_error.clear();
  auto* out = new Parsed();
  if (!parse_impl(text, static_cast<size_t>(len), out)) {
    delete out;
    return nullptr;
  }
  return out;
}

const char* qps_last_error() { return g_error.c_str(); }

void qps_dims(void* h, int64_t* n, int64_t* m, int64_t* nnz_a, int64_t* nnz_q,
              int64_t* name_len) {
  auto* pr = static_cast<Parsed*>(h);
  *n = pr->n;
  *m = pr->m;
  *nnz_a = static_cast<int64_t>(pr->a.size());
  *nnz_q = static_cast<int64_t>(pr->quad.size());
  *name_len = static_cast<int64_t>(pr->name.size());
}

void qps_fill(void* h, int64_t* a_i, int64_t* a_j, double* a_v, int64_t* q_i,
              int64_t* q_j, double* q_v, double* q_lin, double* l_rows,
              double* u_rows, double* lo, double* up, double* obj_rhs,
              char* name) {
  auto* pr = static_cast<Parsed*>(h);
  for (size_t k = 0; k < pr->a.size(); ++k) {
    a_i[k] = pr->a[k].i;
    a_j[k] = pr->a[k].j;
    a_v[k] = pr->a[k].v;
  }
  for (size_t k = 0; k < pr->quad.size(); ++k) {
    q_i[k] = pr->quad[k].i;
    q_j[k] = pr->quad[k].j;
    q_v[k] = pr->quad[k].v;
  }
  std::memcpy(q_lin, pr->q_lin.data(), pr->n * sizeof(double));
  std::memcpy(l_rows, pr->l_rows.data(), pr->m * sizeof(double));
  std::memcpy(u_rows, pr->u_rows.data(), pr->m * sizeof(double));
  std::memcpy(lo, pr->lo.data(), pr->n * sizeof(double));
  std::memcpy(up, pr->up.data(), pr->n * sizeof(double));
  *obj_rhs = pr->obj_rhs;
  std::memcpy(name, pr->name.data(), pr->name.size());
}

void qps_free(void* h) { delete static_cast<Parsed*>(h); }

}  // extern "C"
