// Stub ceres header for the parity oracle build.
//
// The reference's nonlinearRefinement.h includes <ceres/ceres.h> but its
// declarations don't expose any ceres types, and the functions the oracle
// exercises (minimal::calculateVelocities / getAlpha / getAlphaK,
// /root/reference/src/minimal.cc) never call into ceres.  This empty header
// lets the reference minimal solver compile unmodified without the Ceres
// toolchain; the one ceres-backed symbol minimal.cc references
// (nonlinear_refinement::estimateInverseDepths, used only by ransac) is
// satisfied by the closed-form implementation in ../oracle_main.cc.
#pragma once
