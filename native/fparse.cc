// Fast scanner for numeric literals in Fortran source.
//
// The reference stores physics tables as Fortran DATA / array-constructor
// statements (rrtmg_lw_setcoef.f90:600-2009, rrtmg_lw_init.f90:2037-2675,
// and the ~5 MB generated rrtmg_lw_k_g.f90 in the public release).  Asset
// conversion tokenizes megabytes of source; this native scanner replaces
// the Python regex hot path (~40x faster) with identical semantics:
//   * numbers: [+-]? (digits[.digits] | .digits) ([eEdD][+-]?digits)?
//   * optional Fortran kind suffix `_name` (consumed, ignored)
//   * 'd/D' exponents mean the same as 'e'
//   * text from '!' to end-of-line is a comment (no strings appear in
//     data statements)
// A leading sign is taken only when it is not a binary +/- between two
// numbers, matching the reference data layout (signs in these tables are
// always unary and preceded by '(', ',', '/', or whitespace).
//
// C ABI for ctypes; no Python headers needed.

#include <cstdint>
#include <cstdlib>
#include <cstring>

extern "C" {

// Scans buf[0:len], writes up to cap doubles into out.
// Returns the number of literals found (may exceed cap; only cap are
// written — call once with cap=0 to size the output).
int64_t fparse_extract_numbers(const char* buf, int64_t len,
                               double* out, int64_t cap) {
  int64_t n = 0;
  int64_t i = 0;
  char prev_sig = '(';  // last significant char (for unary-sign test)
  while (i < len) {
    char c = buf[i];
    if (c == '!') {  // comment to EOL
      while (i < len && buf[i] != '\n') i++;
      continue;
    }
    bool starts_number = (c >= '0' && c <= '9') ||
        (c == '.' && i + 1 < len && buf[i + 1] >= '0' && buf[i + 1] <= '9');
    bool prev_operand = (prev_sig >= '0' && prev_sig <= '9') ||
        prev_sig == '.' || prev_sig == ')' || prev_sig == '_' ||
        (prev_sig >= 'a' && prev_sig <= 'z') ||
        (prev_sig >= 'A' && prev_sig <= 'Z');
    bool sign_start = (c == '+' || c == '-') && i + 1 < len &&
        ((buf[i + 1] >= '0' && buf[i + 1] <= '9') || buf[i + 1] == '.') &&
        !prev_operand;
    if (starts_number || sign_start) {
      // find token end
      int64_t j = i;
      if (sign_start) j++;
      bool seen_dot = false, seen_exp = false;
      while (j < len) {
        char d = buf[j];
        if (d >= '0' && d <= '9') { j++; continue; }
        if (d == '.' && !seen_dot && !seen_exp) { seen_dot = true; j++; continue; }
        if ((d == 'e' || d == 'E' || d == 'd' || d == 'D') && !seen_exp) {
          // exponent must be followed by digits or sign+digits
          int64_t k = j + 1;
          if (k < len && (buf[k] == '+' || buf[k] == '-')) k++;
          if (k < len && buf[k] >= '0' && buf[k] <= '9') {
            seen_exp = true;
            j = k;
            continue;
          }
          break;
        }
        break;
      }
      // copy into a small buffer normalizing d->e
      char tmp[64];
      int64_t tl = j - i;
      if (tl > 63) tl = 63;
      for (int64_t k = 0; k < tl; k++) {
        char d = buf[i + k];
        tmp[k] = (d == 'd' || d == 'D') ? 'e' : d;
      }
      tmp[tl] = 0;
      if (n < cap) out[n] = strtod(tmp, nullptr);
      n++;
      // consume kind suffix `_rb` etc.
      if (j < len && buf[j] == '_') {
        j++;
        while (j < len && ((buf[j] >= 'a' && buf[j] <= 'z') ||
                           (buf[j] >= 'A' && buf[j] <= 'Z') ||
                           (buf[j] >= '0' && buf[j] <= '9'))) j++;
      }
      prev_sig = '9';  // a number
      i = j;
      continue;
    }
    if (c != ' ' && c != '\t' && c != '\r' && c != '\n' && c != '&')
      prev_sig = c;
    i++;
  }
  return n;
}

}  // extern "C"
