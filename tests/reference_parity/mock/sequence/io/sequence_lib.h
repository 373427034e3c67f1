// Mock placeholder: include/reads.h pulls in megahit's sequence_lib.h, but
// src/reads.cpp consumes no symbol from it (FASTQ parsing goes through
// kseq++). Nothing to provide.
#ifndef MOCK_SEQUENCE_LIB_H
#define MOCK_SEQUENCE_LIB_H
#endif
