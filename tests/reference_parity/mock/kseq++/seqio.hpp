// Mock of kseq++ (klibpp) for the reference-parity harness. The reference
// consumes exactly one pattern: SeqStreamIn(path).read() iterated for
// record.seq (src/reads.cpp:3-18). This mock parses plain-text FASTA/FASTQ
// (the parity fixtures are uncompressed; gzip inputs would need zlib).
#ifndef MOCK_KSEQPP_SEQIO_HPP
#define MOCK_KSEQPP_SEQIO_HPP

#include <algorithm>  // the real kseq++ header chain provides std::reverse
                      // transitively; reads.cpp:21 relies on it
#include <fstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace klibpp {

struct KSeq {
  std::string name;
  std::string comment;
  std::string seq;
  std::string qual;
};

class SeqStreamIn {
 public:
  explicit SeqStreamIn(const char *path) : in_(path) {
    if (!in_.is_open())
      throw std::runtime_error("cannot open sequence file: " + std::string(path));
  }

  // Read every record in the file (the reference iterates the result).
  std::vector<KSeq> read() {
    std::vector<KSeq> records;
    std::string line;
    while (std::getline(in_, line)) {
      if (line.empty()) continue;
      if (line[0] == '@') {  // FASTQ: header, seq, '+', qual
        KSeq rec;
        split_header_(line.substr(1), rec);
        if (!std::getline(in_, rec.seq)) break;
        std::string plus;
        if (std::getline(in_, plus) && !plus.empty() && plus[0] == '+')
          std::getline(in_, rec.qual);
        records.push_back(std::move(rec));
      } else if (line[0] == '>') {  // FASTA: header, seq lines until next '>'
        KSeq rec;
        split_header_(line.substr(1), rec);
        while (in_.peek() != '>' && in_.peek() != '@' &&
               std::getline(in_, line)) {
          rec.seq += line;
          if (in_.peek() == EOF) break;
        }
        records.push_back(std::move(rec));
      }
    }
    return records;
  }

 private:
  static void split_header_(const std::string &h, KSeq &rec) {
    size_t sp = h.find_first_of(" \t");
    if (sp == std::string::npos) {
      rec.name = h;
    } else {
      rec.name = h.substr(0, sp);
      rec.comment = h.substr(sp + 1);
    }
  }

  std::ifstream in_;
};

}  // namespace klibpp

#endif  // MOCK_KSEQPP_SEQIO_HPP
