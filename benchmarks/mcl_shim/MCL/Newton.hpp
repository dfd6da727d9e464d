// Shim: the reference includes MCL/Newton.hpp but never instantiates it
// (src/TetEnergyTerm.hpp:25-27); an empty include satisfies the build.
#ifndef MCL_OPTLIB_NEWTON_SHIM_H
#define MCL_OPTLIB_NEWTON_SHIM_H
#include "LBFGS.hpp"
#endif
