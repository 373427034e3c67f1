// Mock placeholder: include/reads.h pulls in megahit's idba/sequence.h, but
// src/reads.cpp consumes no symbol from it. Nothing to provide.
#ifndef MOCK_IDBA_SEQUENCE_H
#define MOCK_IDBA_SEQUENCE_H
#endif
