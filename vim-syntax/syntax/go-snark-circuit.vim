" Vim syntax file for the go-snark flat-code circuit DSL
" Language: go-snark-circuit
if exists("b:current_syntax")
  finish
endif

syn keyword circuitKeyword func return import equals out
syn keyword circuitScope private public
syn match circuitNumber '\<\d\+\>'
syn match circuitOperator '[=+*/^-]'
syn match circuitFuncName 'func\s\+\zs\w\+'
syn region circuitString start='"' end='"'
syn match circuitComment '#.*$'

hi def link circuitKeyword Keyword
hi def link circuitScope StorageClass
hi def link circuitNumber Number
hi def link circuitOperator Operator
hi def link circuitFuncName Function
hi def link circuitString String
hi def link circuitComment Comment

let b:current_syntax = "go-snark-circuit"
