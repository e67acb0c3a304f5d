// sudoku.js — hand-written loader for the hand-assembled sudoku.wasm.
//
// Stands in for the emscripten MODULARIZE glue the reference builds
// (reference solver/Makefile.wasm: -s MODULARIZE -s EXPORT_NAME=SudokuSolver,
// consumed by web/src/solver.ts via cwrap). scanner.js only uses
// `module.cwrap(name, ret, args)` and calls the result with numbers, so
// the shim exposes exactly that over the raw WebAssembly exports (the
// module is i32-only: no heap views or string marshalling needed).
//
// The artifact itself is emitted toolchain-free by
// native/solver/emit_wasm.py (see its docstring for the memory layout
// and the export contract) and validated against the native solver by
// tests/test_wasm_artifact.py using the in-repo interpreter.
var SudokuSolver = async function () {
  var resp = await fetch('/sudoku.wasm');
  if (!resp.ok) throw new Error('sudoku.wasm: HTTP ' + resp.status);
  var bytes = await resp.arrayBuffer();
  var result = await WebAssembly.instantiate(bytes, {});
  var ex = result.instance.exports;
  return {
    cwrap: function (name) {
      var f = ex[name];
      if (!f) throw new Error('no export: ' + name);
      return function () {
        var r = f.apply(null, arguments);
        return r === undefined ? null : r;
      };
    },
    memory: ex.memory,
  };
};
